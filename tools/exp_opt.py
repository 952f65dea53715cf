"""TPU experiments: validate toeplitz_dense on hardware + time train step.

Usage: python tools/exp_opt.py <mode>
  modes: toep   - validate + microbench toeplitz kernels
         step   - time flagship train step (current code)
         step64 - same at B=64
         stepbf - same with bf16 residual stream
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root
import sys
import time

from pytorch_end2end_speech_recognition_tpu.utils.platform import (
    enable_compilation_cache,
)
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def mode_toep():
    from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (
        _toeplitz_dense_hlo,
        _toeplitz_reduce_hlo,
        toeplitz_dense,
    )

    rng = np.random.default_rng(0)
    N, T, Tp = 48, 752, 768
    diag = jnp.asarray(rng.standard_normal((N, 2 * T - 1)), jnp.float32)
    # fwd correctness
    got = toeplitz_dense(diag, T, Tp, jnp.float32)
    want = _toeplitz_dense_hlo(diag, T, Tp, jnp.float32)
    err = float(jnp.abs(got[:, :T, :T] - want[:, :T, :T]).max())
    print("toep fwd max err:", err, flush=True)
    assert err < 1e-6
    # bwd correctness
    ct = jnp.asarray(rng.standard_normal((N, Tp, Tp)), jnp.float32)
    ct = ct.at[:, T:, :].set(0.0).at[:, :, T:].set(0.0)

    def loss_new(d):
        return jnp.sum(toeplitz_dense(d, T, Tp, jnp.float32) * ct)

    gnew = jax.jit(jax.grad(loss_new))(diag)
    gref = _toeplitz_reduce_hlo(ct[:, :T, :T], T)
    err = float(jnp.abs(gnew - gref).max())
    print("toep bwd max err:", err, flush=True)
    assert err < 1e-3
    # microbench fwd+bwd vs HLO, bf16 output like the real model
    for name, f in (
        ("pallas", lambda d: toeplitz_dense(d, T, Tp, jnp.bfloat16)),
        ("hlo", lambda d: _toeplitz_dense_hlo(d, T, Tp, jnp.bfloat16)),
    ):
        jf = jax.jit(f)
        print(f"toep {name} fwd ms:", timeit(jf, diag), flush=True)
        g = jax.jit(jax.grad(
            lambda d: jnp.sum(f(d).astype(jnp.float32) * ct)))
        print(f"toep {name} fwd+bwd ms:", timeit(g, diag), flush=True)


def mode_step(B=32, residual=None):
    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        configure_prng,
    )
    configure_prng("rbg")
    from __graft_entry__ import _flagship_cfg
    from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
    from pytorch_end2end_speech_recognition_tpu.training.losses import (
        hybrid_loss,
    )
    from pytorch_end2end_speech_recognition_tpu.training.schedules import (
        make_optimizer,
    )

    cfg = _flagship_cfg()
    if residual:
        cfg.model.residual_dtype = residual
    rng = np.random.default_rng(0)
    sec = 30.0
    Ts = int(sec * cfg.frontend.sample_rate)
    audio = jnp.asarray(rng.standard_normal((B, Ts)).astype(np.float32) * 0.1)
    audio_lens = jnp.full((B,), Ts, jnp.int32)
    U = 64
    tokens = jnp.asarray(
        rng.integers(3, cfg.model.vocab_size, (B, U)).astype(np.int32))
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
            ll, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                                cfg.model.ctc_weight,
                                ctc_impl=cfg.model.ctc_impl)
            return ll
        g = jax.grad(loss)(p)
        up, o2 = tx.update(g, o, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, up), o2

    t0 = time.perf_counter()
    train_step(params, opt_state, key)
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    dt = timeit(lambda: train_step(params, opt_state, key), n=10)
    print(f"step B={B} residual={residual}: {dt:.1f} ms  "
          f"{B * sec / (dt / 1000):.0f} audio-s/s", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "toep"
    if mode == "toep":
        mode_toep()
    elif mode == "step":
        mode_step()
    elif mode == "step64":
        mode_step(B=64)
    elif mode == "stepbf":
        mode_step(residual="bfloat16")
