"""Conv-residue A/Bs (r4 VERDICT task 1a): the train step's remaining
low-MFU compute is "conv2d subsample + depthwise convs ~6 ms fwd+bwd at
~3% MFU" (PERF_r3 §2). Isolate each and A/B TPU-idiomatic rewrites:

  dw     — ConvModule's depthwise conv: XLA grouped-conv lowering vs a
           static tap-sum (K shifted slices x per-channel weights — pure
           VPU FMAs, no grouped-conv lowering)
  sub    — ConvSubsample standalone fwd+bwd: native NHWC convs vs the
           conv1 9-tap gather-matmul form (r3 lost 6-11x on a variant of
           this; re-measured here at the r5 compiler for the record)
  step   — full train-step marginal of the winning dw variant

Usage: python tools/exp_conv.py [ab=dw,sub]
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import statistics
import sys
import time

from pytorch_end2end_speech_recognition_tpu.utils.platform import (
    configure_prng,
    enable_compilation_cache,
)

enable_compilation_cache()
configure_prng("rbg")
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from __graft_entry__ import _flagship_cfg
from pytorch_end2end_speech_recognition_tpu.models.encoders import (
    ConvSubsample,
)


def timeit_windowed(fn, n=10, warmup=3, windows=5):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n * 1000)
    return statistics.median(ts), (statistics.stdev(ts) if len(ts) > 1
                                   else 0.0)


def bench_dw():
    """Depthwise conv (B=32, T=752, D=256, K=15) fwd+bwd, x12 layers'
    worth of work folded into one timing by looping inside jit."""
    B, T, D, K = 32, 752, 256, 15
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, 1, D)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    b = jnp.zeros((D,), jnp.bfloat16)

    import flax.linen  # noqa: F401  (nnx.Conv uses lax under the hood)

    def native_one(x, w, b):
        return jax.lax.conv_general_dilated(
            x, w.reshape(K, 1, D), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=D) + b

    def taps_one(x, w, b):
        pad_l = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad_l, K - 1 - pad_l), (0, 0)))
        out = b.astype(jnp.float32) + 0.0 * x.astype(jnp.float32)
        for k in range(K):
            out = out + (xp[:, k : k + T] * w[k, 0]).astype(jnp.float32)
        return out.astype(x.dtype)

    # correctness first
    ref = native_one(x, w, b)
    got = taps_one(x, w, b)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"[dw] taps vs native max err: {err:.3e}", flush=True)

    for name, f in (("native", native_one), ("taps", taps_one)):
        @jax.jit
        def fb(x, w, b, f=f):
            def loss(x, w, b):
                out = x
                for _ in range(12):          # 12 conformer layers' worth
                    out = f(out, w, b)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))(x, w, b)

        med, sd = timeit_windowed(lambda: fb(x, w, b))
        print(f"[dw x12 fwd+bwd] {name}: {med:.3f} +/- {sd:.3f} ms",
              flush=True)


def bench_sub():
    cfg = _flagship_cfg()
    B, T, F = 32, 2998, 80
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    sub = ConvSubsample(F, cfg.model.encoder_dim, cfg.model, nnx.Rngs(0))
    gd, st = nnx.split(sub)

    @jax.jit
    def fb(st, x):
        def loss(st):
            m = nnx.merge(gd, st)
            h, _ = m(x, lens)
            return jnp.sum(h.astype(jnp.float32) ** 2)
        return jax.tree_util.tree_map(lambda g: jnp.sum(g * g),
                                      jax.grad(loss)(st))

    med, sd = timeit_windowed(lambda: fb(st, x))
    print(f"[subsample fwd+bwd] native: {med:.3f} +/- {sd:.3f} ms",
          flush=True)


def main():
    abs_ = ["dw", "sub"]
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        if k == "ab":
            abs_ = v.split(",")
    if "dw" in abs_:
        bench_dw()
    if "sub" in abs_:
        bench_sub()


if __name__ == "__main__":
    main()
