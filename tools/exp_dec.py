"""Decoder-branch profile: time + per-op HLO stats for the transformer
decoder fwd+bwd alone (frozen encoder output), at the flagship shape.

The r5 marginal A/B (tools/exp_r5.py dec rows) showed the decoder branch
costs ~7.2 ms/step while contributing ~1e10 flops (<1% MFU) — the largest
low-efficiency residue left in the train step. This isolates it.

Usage: python tools/exp_dec.py [variant]   (variant: base | bf16)
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import glob
import json
import shutil
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
from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
from pytorch_end2end_speech_recognition_tpu.training.losses import hybrid_loss


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    if "bf16" in variant:
        # candidate: run the decoder's attention matmuls in bf16 (softmax
        # stays f32) — the module keeps an all-f32 stream for numerics
        import pytorch_end2end_speech_recognition_tpu.models.decoder_transformer as dtm  # noqa: E501

        def mha_bf16(q, k, v, mask, heads):
            B, Tq, D = q.shape
            Tk = k.shape[1]
            dh = D // heads
            bt = jnp.bfloat16
            qh = q.reshape(B, Tq, heads, dh).transpose(0, 2, 1, 3).astype(bt)
            kh = k.reshape(B, Tk, heads, dh).transpose(0, 2, 1, 3).astype(bt)
            vh = v.reshape(B, Tk, heads, dh).transpose(0, 2, 1, 3).astype(bt)
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                           preferred_element_type=jnp.float32) / np.sqrt(dh)
            s = jnp.where(mask, s, dtm.NEG_INF)
            w = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(bt), vh,
                             preferred_element_type=jnp.float32)
            return out.transpose(0, 2, 1, 3).reshape(B, Tq, D), w

        dtm.mha = mha_bf16
        print("[variant] decoder mha matmuls in bf16", flush=True)
    cfg = _flagship_cfg()
    if variant.startswith("tdec"):
        # transformer decoder (parallel teacher forcing) vs the lstm
        # speller's 65-step scan — the flagship/rung-4 presets inherited
        # decoder='lstm' from ModelConfig
        cfg.model.decoder = "transformer"
        cfg.model.decoder_layers = int(variant[4:].split("bf16")[0] or 6)
        print(f"[variant] transformer decoder L={cfg.model.decoder_layers}",
              flush=True)
    rng = np.random.default_rng(0)
    B, sec, U = 32, 30.0, 64
    Ts = int(sec * cfg.frontend.sample_rate)
    audio = jnp.asarray(rng.standard_normal((B, Ts)).astype(np.float32) * 0.1)
    audio_lens = jnp.full((B,), Ts, jnp.int32)
    tokens = jnp.asarray(
        rng.integers(3, cfg.model.vocab_size, (B, U)).astype(np.int32))
    token_lens = jnp.full((B,), U, jnp.int32)
    key = jax.random.PRNGKey(0)
    model = AsrModel(cfg, nnx.Rngs(0))
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    @jax.jit
    def get_enc(p):
        m = nnx.merge(graphdef, p, rest)
        return m.encode(audio, audio_lens, train=False)

    enc, enc_lens = get_enc(params)
    enc = jax.lax.stop_gradient(enc)

    @jax.jit
    def dec_step(p, k):
        def loss(p):
            m = nnx.merge(graphdef, p, rest)
            att = m.decoder(enc, enc_lens, tokens, token_lens, train=True,
                            rng=k)
            l, _ = hybrid_loss(None, enc_lens, att, tokens, token_lens,
                               0.0)
            return l
        return jax.tree_util.tree_map(
            lambda g: jnp.sum(g * g), jax.grad(loss)(p))

    out = dec_step(params, key)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = dec_step(params, key)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 10 * 1000)
    med = statistics.median(ts)
    fl = float(dec_step.lower(params, key).compile()
               .cost_analysis().get("flops", 0))
    print(f"decoder fwd+bwd: {med:.2f} ms  flops={fl:.3e}  "
          f"MFU={fl / (med / 1000) / 197e12:.4f}", flush=True)

    if variant != "base":
        return
    logdir = "/tmp/jax-trace-dec"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = dec_step(params, key)
        jax.block_until_ready(out)
    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats^", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    with open("/tmp/hlo_stats_dec.json", "w") as f:
        f.write(data)
    # top self-time ops
    d = json.loads(data)
    rows = d if isinstance(d, list) else d.get("data", d)
    try:
        cols = [c["label"] if isinstance(c, dict) else c
                for c in rows[0]]
        print("columns:", cols[:12], flush=True)
    except Exception:
        pass
    print("wrote /tmp/hlo_stats_dec.json", flush=True)


if __name__ == "__main__":
    main()
