"""Platform resolution of 'auto' config fields (r3 VERDICT missing item 1).

The shipped presets must deliver the production TPU configuration — Pallas
frontend/CTC/attention/LSTM kernels, bf16 compute + residual stream, bf16
DFT operands, rbg PRNG — when resolved for a TPU backend, and the portable
XLA/f32 paths on CPU, with an explicit `--set` of a concrete value acting
as the opt-out.
"""

import pytest

from pytorch_end2end_speech_recognition_tpu.configs.presets import PRESETS
from pytorch_end2end_speech_recognition_tpu.utils.config import (
    AsrConfig,
    parse_overrides,
    resolve_platform,
)


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_presets_resolve_to_production_tpu_config(name):
    cfg = resolve_platform(PRESETS[name](), backend="tpu")
    assert cfg.frontend.impl == "pallas"
    assert cfg.frontend.dft_dtype == "bfloat16"
    assert cfg.model.dtype == "bfloat16"
    assert cfg.model.residual_dtype == "bfloat16"
    assert cfg.model.ctc_impl == "pallas"
    assert cfg.model.attn_impl == "pallas"
    assert cfg.model.lstm_impl == "pallas"
    # fused FFN is opt-in pending hardware validation (see resolve_platform)
    assert cfg.model.ffn_impl == "xla"
    assert cfg.train.prng_impl == "rbg"


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_presets_resolve_to_portable_cpu_config(name):
    cfg = resolve_platform(PRESETS[name](), backend="cpu")
    assert cfg.frontend.impl == "jnp"
    assert cfg.frontend.dft_dtype == "float32"
    assert cfg.model.dtype == "float32"
    assert cfg.model.residual_dtype == "float32"
    assert cfg.model.ctc_impl == "xla"
    assert cfg.model.attn_impl == "xla"
    assert cfg.model.lstm_impl == "xla"
    assert cfg.model.ffn_impl == "xla"


def test_explicit_override_is_the_opt_out():
    cfg = PRESETS["flagship_conformer"]()
    parse_overrides(cfg, ["frontend.impl=jnp", "model.dtype=float32",
                          "model.attn_impl=xla"])
    resolve_platform(cfg, backend="tpu")
    # user-pinned values survive; untouched fields still resolve for TPU
    assert cfg.frontend.impl == "jnp"
    assert cfg.model.dtype == "float32"
    assert cfg.model.attn_impl == "xla"
    assert cfg.model.ctc_impl == "pallas"
    assert cfg.model.residual_dtype == "bfloat16"


def test_resolution_is_idempotent():
    cfg = resolve_platform(AsrConfig(), backend="tpu")
    snap = cfg.to_json()
    resolve_platform(cfg, backend="cpu")  # already concrete: no-op
    assert cfg.to_json() == snap


def test_model_build_resolves_in_place():
    # constructing the model resolves 'auto' for the ambient backend (CPU
    # in CI) without any explicit resolve_platform call by the caller
    from flax import nnx

    from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel

    cfg = PRESETS["flagship_conformer"]()
    cfg.model.encoder_layers = 1
    cfg.model.encoder_dim = 32
    cfg.model.encoder_ffn_dim = 64
    cfg.model.decoder_dim = 32
    cfg.model.vocab_size = 8
    assert cfg.model.attn_impl == "auto"
    AsrModel(cfg, nnx.Rngs(0))
    assert cfg.model.attn_impl == "xla"
    assert cfg.model.dtype == "float32"
    assert cfg.frontend.impl == "jnp"
