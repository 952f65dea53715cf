"""Extended benchmark suite (bench.py stays the driver's one-line headline).

Covers the three BASELINE.json:2 metrics plus kernel microbenches:
  - encode+CTC+greedy audio-s/s/chip (flagship Conformer)
  - full train-step audio-s/s/chip (fwd+bwd+optimizer)
  - joint CTC/attention beam-decode RTF (on-device beam)
  - frontend / LSTM / CTC kernel timings (pallas vs xla)
  - ladder-rung shapes: rung-4 (16L/d512) and rung-5 (24L/d1024) encode +
    train-step throughput with achieved MFU (VERDICT r1 item 3 — bench the
    real flagship, not just the 12L/d256 headline model)

Writes one JSON line per metric; run on the TPU.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial


def timeit(fn, *args, n=10, warmup=2, windows=5):
    """Median per-iteration time over `windows` independent timed windows
    (fresh dispatches each) — single windows cannot resolve this chip's
    +/-2-3% drift (r3 VERDICT weak item 2; bench.py does the same)."""
    import statistics

    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n)
    timeit.last_rel_sd = (statistics.stdev(ts) / statistics.median(ts)
                          if len(ts) > 1 else 0.0)
    return statistics.median(ts)


def emit(name, value, unit, **extra):
    print(json.dumps({"metric": name, "value": round(value, 3),
                      "unit": unit, **extra}), flush=True)


def main():
    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        configure_prng,
        enable_compilation_cache,
    )

    enable_compilation_cache()
    # match the production Solver (train.prng_impl='rbg'): threefry counters
    # fuse into every dropout-adjacent op and cost ~17% of the train step
    configure_prng("rbg")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from __graft_entry__ import _flagship_cfg
    from pytorch_end2end_speech_recognition_tpu.decode.beam import (
        BeamSearchDecoder,
    )
    from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
    from pytorch_end2end_speech_recognition_tpu.ops.ctc import (
        ctc_greedy_decode,
    )
    from pytorch_end2end_speech_recognition_tpu.training.losses import (
        hybrid_loss,
    )
    from pytorch_end2end_speech_recognition_tpu.training.schedules import (
        make_optimizer,
    )
    from pytorch_end2end_speech_recognition_tpu.utils.config import DecodeConfig

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print(f"[benchmarks] device={dev}", file=sys.stderr)
    cfg = _flagship_cfg(small=not on_tpu)

    rng = np.random.default_rng(0)
    B, sec = (32 if on_tpu else 8), 30.0  # match bench.py's batch on TPU
    sr = cfg.frontend.sample_rate
    Ts = int(sec * sr)
    audio = jax.device_put(jnp.asarray(
        rng.standard_normal((B, Ts)).astype(np.float32) * 0.1))
    audio_lens = jnp.full((B,), Ts, jnp.int32)
    U = 64
    tokens = jnp.asarray(rng.integers(3, cfg.model.vocab_size, (B, U))
                         .astype(np.int32))
    token_lens = jnp.full((B,), U, jnp.int32)

    model = AsrModel(cfg, nnx.Rngs(0))
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    # ---- encode + ctc + greedy
    @jax.jit
    def fwd(params, audio, audio_lens):
        m = nnx.merge(graphdef, params, rest)
        enc, enc_lens = m.encode(audio, audio_lens, train=False)
        logits = m.ctc_logits(enc)
        return ctc_greedy_decode(logits, enc_lens)

    from pytorch_end2end_speech_recognition_tpu.utils.profiling import (
        device_peaks,
    )

    peak_tflops, _ = device_peaks()

    def mfu_of(jitted, dt, *args):
        try:
            fl = float(jitted.lower(*args).compile().cost_analysis()
                       .get("flops", 0))
            return round(fl / dt / (peak_tflops * 1e12), 4)
        except Exception:
            return 0.0

    dt = timeit(fwd, params, audio, audio_lens)
    emit("encode_ctc_greedy_audio_s_per_s", B * sec / dt, "audio-s/s/chip",
         mfu=mfu_of(fwd, dt, params, audio, audio_lens),
         rel_sd=round(timeit.last_rel_sd, 4))

    # ---- full train step
    tx = make_optimizer(cfg.train)
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=())
    def train_step(params, opt_state, rng_key):
        def loss_fn(p):
            m = nnx.merge(graphdef, p, rest)
            enc, enc_lens = m.encode(audio, audio_lens, train=True,
                                     rng=rng_key)
            logits = m.ctc_logits(enc)
            att = m.decoder(enc, enc_lens, tokens, token_lens, train=True)
            loss, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                                  cfg.model.ctc_weight,
                                  ctc_impl=cfg.model.ctc_impl)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda a, b: a + b, params,
                                            updates)
        return new_params, new_opt, loss

    key = jax.random.PRNGKey(0)
    dt = timeit(lambda: train_step(params, opt_state, key), n=10)
    emit("train_step_audio_s_per_s", B * sec / dt, "audio-s/s/chip",
         mfu=mfu_of(train_step, dt, params, opt_state, key),
         rel_sd=round(timeit.last_rel_sd, 4))

    # ---- beam decode RTF
    dcfg = DecodeConfig(beam_size=10, ctc_weight=0.3, pre_beam_k=30, nbest=1)
    bsd = BeamSearchDecoder(model, dcfg)

    @jax.jit
    def encode_for_beam(params, audio, audio_lens):
        m = nnx.merge(graphdef, params, rest)
        enc, enc_lens = m.encode(audio, audio_lens, train=False)
        return enc, enc_lens, jax.nn.log_softmax(m.ctc_logits(enc), axis=-1)

    enc, enc_lens, ctc_logp = encode_for_beam(params, audio, audio_lens)
    max_len = min(int(0.2 * enc.shape[1]), 150)

    def beam_fn():
        return bsd.search_arrays(enc, enc_lens, ctc_logp, max_len)

    dt = timeit(beam_fn, n=5)
    rtf = dt / (B * sec)
    emit("beam_decode_rtf", rtf, "s-compute/s-audio",
         beam=10, inv_rtf=round(1.0 / rtf, 1),
         rel_sd=round(timeit.last_rel_sd, 4),
         note="batch-32 amortized, max_len capped at min(0.2*T,150)")

    # ---- honest RTF companions (r4 VERDICT weak item 3): the capped
    # batch-amortized number above flatters the product default
    # (max_decode_ratio=1.0). Report batch-1 latency and the ratio-1.0
    # worst case (random audio + untrained model never emits EOS, so the
    # beam runs ALL max_len steps — an upper bound; a trained model
    # EOS-exits far earlier, see tools/quality_* decode timings).
    enc1, el1, lp1 = enc[:1], enc_lens[:1], ctc_logp[:1]
    dt = timeit(lambda: bsd.search_arrays(enc1, el1, lp1, max_len),
                n=3, windows=3)
    emit("beam_decode_batch1_latency_ms", dt * 1000, "ms",
         beam=10, rtf=round(dt / sec, 4),
         rel_sd=round(timeit.last_rel_sd, 4),
         note="single 30 s utterance, capped max_len")
    max_len_full = enc.shape[1]  # product default max_decode_ratio=1.0
    dt = timeit(lambda: bsd.search_arrays(enc, enc_lens, ctc_logp,
                                          max_len_full), n=1, windows=3)
    rtf = dt / (B * sec)
    emit("beam_decode_rtf_worstcase", rtf, "s-compute/s-audio",
         beam=10, inv_rtf=round(1.0 / rtf, 1), max_len=max_len_full,
         rel_sd=round(timeit.last_rel_sd, 4),
         note="batch-32, max_decode_ratio=1.0, no EOS exit (upper bound)")

    # ---- kernel microbenches (TPU only: pallas vs xla)
    if on_tpu:
        from pytorch_end2end_speech_recognition_tpu.ops.frontend import (
            Frontend,
        )
        from pytorch_end2end_speech_recognition_tpu.utils.config import (
            FrontendConfig,
        )

        for impl in ("jnp", "pallas"):
            fe = Frontend(FrontendConfig(cmvn="utt", spec_augment=False,
                                         impl=impl))
            dt = timeit(lambda fe=fe: fe(audio, audio_lens), n=20)
            emit(f"frontend_{impl}_audio_s_per_s", B * sec / dt, "audio-s/s")

        from pytorch_end2end_speech_recognition_tpu.ops.ctc import ctc_loss
        T, V = 752, 1024
        logits = jax.device_put(jnp.asarray(
            rng.standard_normal((8, T, V)).astype(np.float32)))
        llens = jnp.full((8,), T, jnp.int32)
        labels = jnp.asarray(rng.integers(3, V, (8, 128)).astype(np.int32))
        lab_lens = jnp.full((8,), 128, jnp.int32)
        for impl in ("xla", "pallas"):
            g = jax.jit(jax.grad(lambda x: ctc_loss(
                x, llens, labels, lab_lens, impl=impl).sum()))
            dt = timeit(g, logits, n=10)
            emit(f"ctc_{impl}_grad_ms", dt * 1000, "ms")

    # ---- ladder-rung shapes (the "real flagship" benches): rung-4 and
    # rung-5 conformers, single chip, encode + train step with achieved MFU
    def bench_rung(tag, layers, d, ffn, heads, Br, remat):
        c = _flagship_cfg(small=not on_tpu)
        c.model.encoder_layers = layers
        c.model.encoder_dim = d
        c.model.encoder_ffn_dim = ffn
        c.model.encoder_heads = heads
        # match the rung-4/5 preset pairing (libri960_*): 6-layer
        # transformer decoder at d512 regardless of encoder width
        c.model.decoder = "transformer"
        c.model.decoder_layers = 6
        c.model.decoder_heads = 8
        c.model.decoder_dim = 512
        c.model.subsample_channels = 128  # match the rung-4/5 presets
        c.model.remat = remat
        m = AsrModel(c, nnx.Rngs(0))
        gd, p, r = nnx.split(m, nnx.Param, ...)
        a = audio[:Br]
        al = audio_lens[:Br]
        tk, tl = tokens[:Br], token_lens[:Br]

        @jax.jit
        def fwd_r(p):
            mm = nnx.merge(gd, p, r)
            enc, el = mm.encode(a, al, train=False)
            return ctc_greedy_decode(mm.ctc_logits(enc), el)

        dt = timeit(fwd_r, p, n=5)
        fl = float(fwd_r.lower(p).compile().cost_analysis().get("flops", 0))
        emit(f"{tag}_encode_audio_s_per_s", Br * sec / dt, "audio-s/s/chip",
             mfu=round(fl / dt / (peak_tflops * 1e12), 4),
             rel_sd=round(timeit.last_rel_sd, 4))

        txr = make_optimizer(c.train)
        os_r = txr.init(p)

        # donate like the production Solver: without it, params + adam state
        # are held twice and the rung-5 (24L/d1024) step OOMs 16 GB HBM
        @partial(jax.jit, donate_argnums=(0, 1))
        def step_r(p, o, k):
            def loss(p):
                mm = nnx.merge(gd, p, r)
                enc, el = mm.encode(a, al, train=True, rng=k)
                logits = mm.ctc_logits(enc)
                att = mm.decoder(enc, el, tk, tl, train=True)
                l, _ = hybrid_loss(logits, el, att, tk, tl,
                                   c.model.ctc_weight,
                                   ctc_impl=c.model.ctc_impl)
                return l
            g = jax.grad(loss)(p)
            up, o2 = txr.update(g, o, p)
            return jax.tree_util.tree_map(lambda x, u: x + u, p, up), o2

        fl = float(step_r.lower(p, os_r, key).compile()
                   .cost_analysis().get("flops", 0))
        p, os_r = step_r(p, os_r, key)          # warmup (donates originals)
        p, os_r = step_r(p, os_r, key)
        jax.block_until_ready(p)
        # windowed like timeit() — single windows cannot resolve this
        # chip's +/-2-3% drift and the rung-4 train MFU has swung
        # 0.375/0.318/0.243 across single captures (r4 VERDICT weak
        # item 2). Donated buffers force threading state through the
        # loop, so the windowing is inlined here.
        import statistics
        ts = []
        n_it = 5
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(n_it):
                p, os_r = step_r(p, os_r, key)
            jax.block_until_ready(p)
            ts.append((time.perf_counter() - t0) / n_it)
        dt = statistics.median(ts)
        rel_sd = statistics.stdev(ts) / dt if len(ts) > 1 else 0.0
        emit(f"{tag}_train_step_audio_s_per_s", Br * sec / dt,
             "audio-s/s/chip",
             mfu=round(fl / dt / (peak_tflops * 1e12), 4),
             rel_sd=round(rel_sd, 4))

    if on_tpu:
        bench_rung("rung4", 16, 512, 2048, 8, 16, remat=False)
        bench_rung("rung5", 24, 1024, 4096, 16, 8, remat=True)


if __name__ == "__main__":
    main()
