"""TPU-native end-to-end speech recognition framework.

A brand-new JAX/XLA/Pallas framework with the capability surface of the
PyTorch reference `carolinebear/pytorch_end2end_speech_recognition`
(see SURVEY.md — the reference mount was empty; BASELINE.json:5-12 is the
spec of record):

- log-mel front-end + SpecAugment, on-device (Pallas kernel on TPU)
- BiLSTM / pyramidal-BiLSTM / Transformer / Conformer encoders
- location-aware-attention LSTM decoder, CTC head, RNN-LM
- hybrid CTC/attention training, greedy CTC + joint beam search decoding
  with RNN-LM shallow fusion, all hypothesis state on-device
- data-parallel + model-parallel scaling over a `jax.sharding.Mesh`
"""

__version__ = "0.1.0"

from pytorch_end2end_speech_recognition_tpu.utils.config import (  # noqa: F401
    AsrConfig,
    DataConfig,
    DecodeConfig,
    FrontendConfig,
    ModelConfig,
    TrainConfig,
)
