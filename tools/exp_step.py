"""Measure full train step under candidate optimizations."""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root
import time, sys
import jax, jax.numpy as jnp, numpy as np
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.utils.platform import (
    enable_compilation_cache,
)
enable_compilation_cache()
from pytorch_end2end_speech_recognition_tpu.utils.platform import configure_prng
configure_prng("rbg")  # match Solver default (train.prng_impl)
from __graft_entry__ import _flagship_cfg
from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
from pytorch_end2end_speech_recognition_tpu.training.losses import hybrid_loss
from pytorch_end2end_speech_recognition_tpu.training.schedules import make_optimizer


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def step_time(cfg, B=32, sec=30.0):
    rng = np.random.default_rng(0)
    Ts = int(sec * cfg.frontend.sample_rate)
    audio = jnp.asarray(rng.standard_normal((B, Ts)).astype(np.float32) * 0.1)
    audio_lens = jnp.full((B,), Ts, jnp.int32)
    U = 64
    tokens = jnp.asarray(rng.integers(3, cfg.model.vocab_size, (B, U)).astype(np.int32))
    token_lens = jnp.full((B,), U, jnp.int32)
    key = jax.random.PRNGKey(0)
    model = AsrModel(cfg, nnx.Rngs(0))
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = make_optimizer(cfg.train)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(p, o, k):
        def loss(p):
            m = nnx.merge(graphdef, p, rest)
            enc, enc_lens = m.encode(audio, audio_lens, train=True, rng=k)
            logits = m.ctc_logits(enc)
            att = m.decoder(enc, enc_lens, tokens, token_lens, train=True)
            l, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                               cfg.model.ctc_weight, ctc_impl=cfg.model.ctc_impl)
            return l
        g = jax.grad(loss)(p)
        up, o2 = tx.update(g, o, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, up), o2

    dt = timeit(lambda: train_step(params, opt_state, key), n=10)
    return dt, B * sec / (dt / 1000)


cfg = _flagship_cfg()
dt, tput = step_time(cfg)
print(f"base+decoderopt B=32: {dt:.1f} ms  {tput:.0f} audio-s/s", flush=True)

cfg = _flagship_cfg()
cfg.model.residual_dtype = "bfloat16"
dt, tput = step_time(cfg)
print(f"+bf16 residual B=32: {dt:.1f} ms  {tput:.0f} audio-s/s", flush=True)

cfg = _flagship_cfg()
cfg.model.residual_dtype = "bfloat16"
dt, tput = step_time(cfg, B=64)
print(f"+bf16 residual B=64: {dt:.1f} ms  {tput:.0f} audio-s/s", flush=True)
