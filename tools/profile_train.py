"""Segment-level timing of the flagship train step on the real TPU."""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root
import time, sys
from functools import partial

from pytorch_end2end_speech_recognition_tpu.utils.platform import (
    enable_compilation_cache,
)
enable_compilation_cache()
from pytorch_end2end_speech_recognition_tpu.utils.platform import configure_prng
configure_prng("rbg")  # match Solver default (train.prng_impl)
import jax, jax.numpy as jnp, numpy as np
from flax import nnx
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
    return (time.perf_counter() - t0) / n * 1000  # ms


cfg = _flagship_cfg()
rng = np.random.default_rng(0)
B, sec = 32, 30.0
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


def merged(p):
    return nnx.merge(graphdef, p, rest)


# 1. encoder fwd (train mode w/ specaug+dropout)
@jax.jit
def enc_fwd(p, k):
    m = merged(p)
    enc, enc_lens = m.encode(audio, audio_lens, train=True, rng=k)
    return enc.sum()

print("enc_fwd_train_ms", timeit(enc_fwd, params, key), flush=True)

# 2. encoder fwd+bwd only
@jax.jit
def enc_grad(p, k):
    return jax.value_and_grad(lambda p: enc_fwd.__wrapped__(p, k))(p)[0]

@jax.jit
def enc_grad_inner(p, k):
    def loss(p):
        m = merged(p)
        enc, _ = m.encode(audio, audio_lens, train=True, rng=k)
        return enc.astype(jnp.float32).sum()
    return jax.grad(loss)(p)

print("enc_fwdbwd_ms", timeit(enc_grad_inner, params, key), flush=True)

# 3. + CTC loss grad (ctc only, lambda=1)
@jax.jit
def ctc_grad(p, k):
    def loss(p):
        m = merged(p)
        enc, enc_lens = m.encode(audio, audio_lens, train=True, rng=k)
        logits = m.ctc_logits(enc)
        l, _ = hybrid_loss(logits, enc_lens, None, tokens, token_lens, 1.0,
                           ctc_impl=cfg.model.ctc_impl)
        return l
    return jax.grad(loss)(p)

print("enc_ctc_fwdbwd_ms", timeit(ctc_grad, params, key), flush=True)

# 4. decoder-only grad: encoder under stop_gradient
@jax.jit
def dec_grad(p, k):
    def loss(p):
        m = merged(p)
        enc, enc_lens = m.encode(audio, audio_lens, train=False)
        enc = jax.lax.stop_gradient(enc)
        att = m.decoder(enc, enc_lens, tokens, token_lens, train=True, rng=k)
        l, _ = hybrid_loss(None, enc_lens, att, tokens, token_lens, 0.0)
        return l
    return jax.grad(loss)(p)

print("frozen_enc_plus_dec_fwdbwd_ms", timeit(dec_grad, params, key), flush=True)

# 4b. decoder fwd only on precomputed enc
m0 = merged(params)
enc0, enc_lens0 = jax.jit(lambda: m0.encode(audio, audio_lens, train=False))()

@jax.jit
def dec_fwd(p, k):
    m = merged(p)
    att = m.decoder(enc0, enc_lens0, tokens, token_lens, train=True, rng=k)
    return att.sum()

print("dec_fwd_ms", timeit(dec_fwd, params, key), flush=True)

@jax.jit
def dec_only_grad(p, k):
    def loss(p):
        m = merged(p)
        att = m.decoder(enc0, enc_lens0, tokens, token_lens, train=True, rng=k)
        l, _ = hybrid_loss(None, enc_lens0, att, tokens, token_lens, 0.0)
        return l
    return jax.grad(loss)(p)

print("dec_fwdbwd_ms", timeit(dec_only_grad, params, key), flush=True)

# 5. full hybrid grad
@jax.jit
def full_grad(p, k):
    def loss(p):
        m = merged(p)
        enc, enc_lens = m.encode(audio, audio_lens, train=True, rng=k)
        logits = m.ctc_logits(enc)
        att = m.decoder(enc, enc_lens, tokens, token_lens, train=True, rng=k)
        l, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                           cfg.model.ctc_weight, ctc_impl=cfg.model.ctc_impl)
        return l
    return jax.grad(loss)(p)

print("full_fwdbwd_ms", timeit(full_grad, params, key), flush=True)

# 6. full train step (grad + optimizer)
@jax.jit
def train_step(p, o, k):
    def loss(p):
        m = merged(p)
        enc, enc_lens = m.encode(audio, audio_lens, train=True, rng=k)
        logits = m.ctc_logits(enc)
        att = m.decoder(enc, enc_lens, tokens, token_lens, train=True, rng=k)
        l, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                           cfg.model.ctc_weight, ctc_impl=cfg.model.ctc_impl)
        return l
    g = jax.grad(loss)(p)
    updates, o2 = tx.update(g, o, p)
    p2 = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
    return p2, o2

print("full_train_step_ms", timeit(train_step, params, opt_state, key), flush=True)
print("audio_s_per_s", B * sec / (timeit(train_step, params, opt_state, key) / 1000))
