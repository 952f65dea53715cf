"""Shared tiny config for the multi-host equivalence tests.

Lives in its own module (not conftest) so spawned jax.distributed worker
processes can import the exact same config the parent test uses.
"""

from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig


def tiny_fit_cfg(corpus_dir: str) -> AsrConfig:
    cfg = AsrConfig(name="multihost_tiny")
    cfg.data.train_manifest = f"{corpus_dir}/train.jsonl"
    cfg.data.dev_manifest = f"{corpus_dir}/dev.jsonl"
    cfg.data.batch_size = 4          # per host -> global 8 at 2 hosts
    cfg.data.n_length_buckets = 1
    cfg.model.encoder = "blstm"
    cfg.model.encoder_layers = 2
    cfg.model.encoder_dim = 64
    cfg.model.encoder_dropout = 0.0  # keep DP run bitwise-comparable
    cfg.model.ctc_weight = 1.0
    cfg.model.dtype = "float32"
    cfg.frontend.spec_augment = False
    cfg.train.lr = 1e-3
    cfg.train.schedule = "constant"
    cfg.train.log_every = 1
    cfg.train.eval_every = 10**9     # no mid-fit eval/ckpt in these tests
    cfg.train.metrics_path = ""
    return cfg
