"""r5 train-step A/B experiments (r4 VERDICT next-round task 1).

Same-session, windowed marginal-cost A/Bs on the flagship train step:
  ab=bwd     new layout-preserving attention-bwd kernel vs the r4
             head-split wrapper (vendored below), same session
  ab=conv    marginal cost of the ConvSubsample (stub substitution)
  ab=dec     marginal cost of the attention decoder branch (ctc-only loss)
  ab=convmm  conv1 as a 9-tap gather matmul (stride-2 slices + (9,C) dot)

Usage: python tools/exp_r5.py [ab=bwd,conv,dec] [B=32] [sec=30]
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
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from __graft_entry__ import _flagship_cfg
from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
from pytorch_end2end_speech_recognition_tpu.training.losses import hybrid_loss
from pytorch_end2end_speech_recognition_tpu.training.schedules import (
    make_optimizer,
)

NEG_INF = -1e30
LANE = 128


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
    med = statistics.median(ts)
    sd = statistics.stdev(ts) if len(ts) > 1 else 0.0
    return med, sd


def step_fn(cfg, B, sec):
    rng = np.random.default_rng(0)
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
    ctc_only = cfg.model.ctc_weight >= 1.0

    @jax.jit
    def train_step(p, o, k):
        def loss(p):
            m = nnx.merge(graphdef, p, rest)
            enc, enc_lens = m.encode(audio, audio_lens, train=True, rng=k)
            logits = m.ctc_logits(enc)
            if ctc_only:
                l, _ = hybrid_loss(logits, enc_lens, None, tokens,
                                   token_lens, 1.0,
                                   ctc_impl=cfg.model.ctc_impl)
            else:
                att = m.decoder(enc, enc_lens, tokens, token_lens,
                                train=True)
                l, _ = hybrid_loss(logits, enc_lens, att, tokens,
                                   token_lens, cfg.model.ctc_weight,
                                   ctc_impl=cfg.model.ctc_impl)
            return l
        g = jax.grad(loss)(p)
        up, o2 = tx.update(g, o, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, up), o2

    fl = float(train_step.lower(params, opt_state, key).compile()
               .cost_analysis().get("flops", 0))
    return (lambda: train_step(params, opt_state, key)), fl


def report(tag, cfg, B, sec):
    fn, fl = step_fn(cfg, B, sec)
    med, sd = timeit_windowed(fn)
    mfu = fl / (med / 1000) / 197e12
    print(f"[{tag}] {med:.2f} +/- {sd:.2f} ms  "
          f"{B * sec / (med / 1000):.0f} audio-s/s  MFU {mfu:.4f}",
          flush=True)
    return med


# ---------------------------------------------------------------- old bwd
# r4's head-split backward, vendored verbatim for the same-session A/B.
def _old_bwd_kernel(lens_ref, q_ref, k_ref, v_ref, g_ref, bias_ref,
                    dq_ref, dk_ref, dv_ref, dbias_ref, *,
                    sm_scale, has_bias):
    b = pl.program_id(1)
    L = lens_ref[b, 0]
    Tp = q_ref.shape[2]
    qs = (q_ref[0, 0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    kh = k_ref[0, 0]
    vh = v_ref[0, 0]
    gh = g_ref[0, 0]
    s = jax.lax.dot_general(
        qs, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    s = jnp.where(col < L, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / den
    pc = p.astype(vh.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(
        pc, gh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        gh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = ds.astype(q_ref.dtype)
    dq_ref[0, 0] = (jax.lax.dot_general(
        dsc, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        dsc, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    if has_bias:
        @pl.when(b == 0)
        def _():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

        dbias_ref[0] += ds


def _old_attention_bwd_pallas(q, k, v, bias, lens, g, heads: int):
    B, T, D = q.shape
    Dh = D // heads
    Tp = -(-T // LANE) * LANE
    pre_padded = bias is not None and bias.shape[-1] == Tp != T
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v, g = (jnp.pad(a, pad) for a in (q, k, v, g))
        if bias is not None and not pre_padded:
            bias = jnp.pad(bias, ((0, 0), (0, Tp - T), (0, Tp - T)))
    has_bias = bias is not None
    bias_in = bias if has_bias else jnp.zeros((1, 8, LANE), q.dtype)

    def split(x):
        return x.reshape(B, Tp, heads, Dh).transpose(2, 0, 1, 3)

    head_in = pl.BlockSpec((1, 1, Tp, Dh), lambda h, b: (h, b, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(
        (1,) + bias_in.shape[1:],
        (lambda h, b: (h, 0, 0)) if has_bias else (lambda h, b: (0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    head_out = pl.BlockSpec((1, 1, Tp, Dh), lambda h, b: (h, b, 0, 0),
                            memory_space=pltpu.VMEM)
    dbias_shape = (heads, Tp, Tp) if has_bias else (1, 8, LANE)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_old_bwd_kernel, sm_scale=1.0 / (Dh ** 0.5),
                          has_bias=has_bias),
        grid=(heads, B),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            head_in, head_in, head_in, head_in, bias_spec,
        ],
        out_specs=(
            head_out, head_out, head_out,
            pl.BlockSpec((1, Tp, Tp), lambda h, b: (h, 0, 0),
                         memory_space=pltpu.VMEM)
            if has_bias else
            pl.BlockSpec(dbias_shape, lambda h, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), k.dtype),
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), v.dtype),
            jax.ShapeDtypeStruct(dbias_shape, jnp.float32),
        ),
    )(lens.astype(jnp.int32).reshape(B, 1), split(q), split(k), split(v),
      split(g), bias_in)

    def merge(x, ref):
        out = x.transpose(1, 2, 0, 3).reshape(B, Tp, D)[:, :T]
        return out.astype(ref.dtype)

    if not has_bias:
        dbias_out = None
    elif pre_padded:
        dbias_out = dbias.astype(bias.dtype)
    else:
        dbias_out = dbias[:, :T, :T].astype(bias.dtype)
    return merge(dq, q), merge(dk, k), merge(dv, v), dbias_out


def main():
    abs_ = ["bwd"]
    B, sec = 32, 30.0
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        if k == "ab":
            abs_ = v.split(",")
        elif k == "B":
            B = int(v)
        elif k == "sec":
            sec = float(v)

    import pytorch_end2end_speech_recognition_tpu.ops.attention_pallas as ap

    if "bwd" in abs_:
        report("bwd=new (shipped)", _flagship_cfg(), B, sec)
        orig = ap._attention_bwd_pallas
        ap._attention_bwd_pallas = _old_attention_bwd_pallas
        try:
            report("bwd=old (r4 head-split)", _flagship_cfg(), B, sec)
        finally:
            ap._attention_bwd_pallas = orig

    if "conv" in abs_:
        import pytorch_end2end_speech_recognition_tpu.models.encoders as enc

        report("conv=real", _flagship_cfg(), B, sec)
        orig_call = enc.ConvSubsample.__call__

        def stub_call(self, x, lens):
            # exact output shape/length math, near-zero conv compute: x4
            # strided slice + tile + the real proj. NOT numerically
            # equivalent — only for costing the conv's marginal step time.
            B_, T, F = x.shape
            T2 = (((T + 1) // 2) + 1) // 2
            h = x[:, 1::4, :][:, :T2]
            lens = ((lens + 1) // 2 + 1) // 2
            C = self.conv2.kernel[...].shape[-1]
            f_out = ((F + 1) // 2 + 1) // 2
            need = f_out * C
            h = jnp.tile(h, (1, 1, -(-need // F)))[:, :, :need]
            h = self.proj(h.astype(self.proj.kernel[...].dtype))
            return h.astype(self.rdt), lens

        enc.ConvSubsample.__call__ = stub_call
        try:
            report("conv=stub", _flagship_cfg(), B, sec)
        finally:
            enc.ConvSubsample.__call__ = orig_call

    if "dec" in abs_:
        report("dec=real", _flagship_cfg(), B, sec)
        cfg = _flagship_cfg()
        cfg.model.ctc_weight = 1.0  # drops the decoder branch entirely
        report("dec=none (ctc-only)", cfg, B, sec)

    if "dectype" in abs_:
        # the flagship/rung-4 presets inherited ModelConfig's
        # decoder='lstm' (65-step scan, ~7 ms marginal at <1% MFU);
        # the genre's conformer recipes pair a transformer decoder
        # (parallel teacher forcing)
        for L in (2, 6):
            cfg = _flagship_cfg()
            cfg.model.decoder = "transformer"
            cfg.model.decoder_layers = L
            report(f"dec=transformer L={L}", cfg, B, sec)


if __name__ == "__main__":
    main()
