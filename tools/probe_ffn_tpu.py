"""Hardware validation + A/B for the fused Pallas FFN (ops/ffn_pallas.py).

Interpret mode cannot exercise the TPU hardware PRNG (prng_random_bits
returns zeros there), so the dropout semantics are validated here on the
real chip, along with bf16 numerics vs the XLA FfnBlock math and the
marginal train-step cost of ffn_impl=pallas vs xla.

Usage: python tools/probe_ffn_tpu.py [--step-ab]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pytorch_end2end_speech_recognition_tpu.utils.platform import (
    enable_compilation_cache,
)

enable_compilation_cache()
import time

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_end2end_speech_recognition_tpu.ops.ffn_pallas import ffn_fused


def ref_ffn(x, gamma, beta, w1, b1, w2, b2, scale, rdt):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    wdt = w1.dtype
    a = jax.nn.silu(jnp.dot(xn.astype(wdt), w1,
                            preferred_element_type=jnp.float32) + b1)
    h = jnp.dot(a.astype(wdt), w2,
                preferred_element_type=jnp.float32) + b2
    return x + (scale * h.astype(rdt).astype(jnp.float32)).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    R, D, F = 24000, 256, 1024
    rdt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((R, D)).astype(np.float32)).astype(rdt)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(D).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((D, F)) / 16).astype(np.float32)).astype(jnp.bfloat16)
    b1 = jnp.asarray(0.1 * rng.standard_normal(F).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray((rng.standard_normal((F, D)) / 32).astype(np.float32)).astype(jnp.bfloat16)
    b2 = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32)).astype(jnp.bfloat16)
    seed = jnp.asarray(0, jnp.int32)

    # ---- values, no dropout
    out = ffn_fused(0.0, 0.5, x, gamma, beta, w1, b1, w2, b2, seed)
    ref = ref_ffn(x, gamma, beta, w1, b1, w2, b2, 0.5, rdt)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    print(f"[values bf16] max err vs XLA math: {err:.3e}", flush=True)
    assert err < 0.05, err

    # ---- grads, no dropout
    cot = jnp.asarray(rng.standard_normal((R, D)).astype(np.float32)).astype(rdt)

    def lf(*a):
        return jnp.sum((ffn_fused(0.0, 0.5, *a, seed) * cot)
                       .astype(jnp.float32))

    def lr(*a):
        return jnp.sum((ref_ffn(*a, 0.5, rdt) * cot).astype(jnp.float32))

    gf = jax.jit(jax.grad(lf, argnums=(0, 1, 3, 5)))(x, gamma, beta, w1, b1, w2, b2)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1, 3, 5)))(x, gamma, beta, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dgamma", "dw1", "dw2"), gf, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        print(f"[grads bf16] {name}: max rel err {rel:.3e}", flush=True)
        assert rel < 0.05, (name, rel)

    # ---- dropout semantics on hardware
    rate = 0.4
    o1 = ffn_fused(rate, 1.0, x, gamma, beta, w1, b1, w2, b2,
                   jnp.asarray(1234, jnp.int32))
    o2 = ffn_fused(rate, 1.0, x, gamma, beta, w1, b1, w2, b2,
                   jnp.asarray(1234, jnp.int32))
    o3 = ffn_fused(rate, 1.0, x, gamma, beta, w1, b1, w2, b2,
                   jnp.asarray(4321, jnp.int32))
    o0 = ffn_fused(0.0, 1.0, x, gamma, beta, w1, b1, w2, b2, seed)
    h1 = np.asarray((o1 - x).astype(np.float32))
    h0 = np.asarray((o0 - x).astype(np.float32))
    assert np.array_equal(np.asarray(o1), np.asarray(o2)), "seed not deterministic"
    assert not np.array_equal(np.asarray(o1), np.asarray(o3)), "seed ignored"
    dropped = (h1 == 0).mean()
    print(f"[dropout] dropped frac {dropped:.3f} (rate {rate})", flush=True)
    assert abs(dropped - rate) < 0.05, dropped
    keep = h1 != 0
    scale_err = np.abs(h1[keep] - (h0 / (1 - rate))[keep]).max()
    print(f"[dropout] kept-scale max abs err {scale_err:.3e}", flush=True)
    # bwd mask replay: same-seed grads identical
    gl = jax.jit(jax.grad(lambda *a: jnp.sum(
        ffn_fused(rate, 1.0, *a, jnp.asarray(7, jnp.int32))
        .astype(jnp.float32) ** 2), argnums=(0, 3)))
    g1 = gl(x, gamma, beta, w1, b1, w2, b2)
    g2 = gl(x, gamma, beta, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    print("[dropout] bwd mask replay deterministic", flush=True)

    if "--step-ab" in sys.argv:
        step_ab()


def step_ab():
    """Flagship train-step marginal cost: ffn_impl pallas vs xla."""
    from flax import nnx

    from __graft_entry__ import _flagship_cfg
    from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
    from pytorch_end2end_speech_recognition_tpu.training.losses import (
        hybrid_loss,
    )
    from pytorch_end2end_speech_recognition_tpu.training.schedules import (
        make_optimizer,
    )
    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        configure_prng,
    )

    configure_prng("rbg")
    rng = np.random.default_rng(0)
    B, sec, U = 32, 30.0, 64

    def step_time(ffn_impl):
        cfg = _flagship_cfg()
        cfg.model.ffn_impl = ffn_impl
        Ts = int(sec * cfg.frontend.sample_rate)
        audio = jnp.asarray(rng.standard_normal((B, Ts)).astype(np.float32) * 0.1)
        audio_lens = jnp.full((B,), Ts, jnp.int32)
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
                l, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                                   cfg.model.ctc_weight,
                                   ctc_impl=cfg.model.ctc_impl)
                return l

            g = jax.grad(loss)(p)
            up, o2 = tx.update(g, o, p)
            return jax.tree_util.tree_map(lambda a, b: a + b, p, up), o2

        out = train_step(params, opt_state, key)
        jax.block_until_ready(out)
        import statistics
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                out = train_step(params, opt_state, key)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / 10 * 1000)
        return statistics.median(ts)

    t_x = step_time("xla")
    t_p = step_time("pallas")
    print(f"[step A/B] ffn=xla {t_x:.2f} ms  ffn=pallas {t_p:.2f} ms  "
          f"delta {t_x - t_p:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
