"""Data-parallel scaling-efficiency benchmark (BASELINE.json:5 ">=85% to
N>=2 hosts"; SURVEY.md §7 PR6; VERDICT r1 item 4).

Measures full-train-step audio-seconds/s at dp=1 vs dp=N using the SAME
mesh/shard_batch/GSPMD code path a real pod uses (parallel/mesh.py,
parallel/sharding.py), and prints per-configuration JSON lines plus an
efficiency summary.

Invocations:
  # wiring/correctness check on 8 virtual CPU devices (CI; numbers are
  # not hardware-meaningful but the code path is the production one):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python bench_scaling.py --dp 1 8 --small

  # real hardware, single host with N chips:
  python bench_scaling.py --dp 1 4

  # real pod, one process per host (same command on every host):
  ASR_COORDINATOR_ADDRESS=host0:1234 ASR_NUM_PROCESSES=2 ASR_PROCESS_ID=$R \
      python bench_scaling.py --dp 1 8 --multihost
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial


def bench_dp(dp: int, small: bool, iters: int, per_device_batch: int,
             utt_seconds: float):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from __graft_entry__ import _flagship_cfg
    from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
    from pytorch_end2end_speech_recognition_tpu.parallel.mesh import make_mesh
    from pytorch_end2end_speech_recognition_tpu.parallel.sharding import (
        shard_batch,
        shard_train_state,
    )
    from pytorch_end2end_speech_recognition_tpu.training.losses import (
        hybrid_loss,
    )
    from pytorch_end2end_speech_recognition_tpu.training.schedules import (
        make_optimizer,
    )

    cfg = _flagship_cfg(small=small)
    if small:
        cfg.model.dtype = "float32"
    B = per_device_batch * dp  # weak scaling: global batch grows with dp
    sr = cfg.frontend.sample_rate
    Ts = int(utt_seconds * sr)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((B, Ts)).astype(np.float32) * 0.1
    audio_lens = np.full((B,), Ts, np.int32)
    U = 16 if small else 64
    tokens = rng.integers(3, cfg.model.vocab_size, (B, U)).astype(np.int32)
    token_lens = np.full((B,), U, np.int32)

    model = AsrModel(cfg, nnx.Rngs(0))
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = make_optimizer(cfg.train)
    opt_state = tx.init(params)

    mesh = make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
    params, opt_state = shard_train_state(mesh, params, opt_state)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, audio, audio_lens, tokens, token_lens,
                   rng):
        def loss_fn(p):
            m = nnx.merge(graphdef, p, rest)
            enc, enc_lens = m.encode(audio, audio_lens, train=True, rng=rng)
            logits = m.ctc_logits(enc)
            att = None
            if m.decoder is not None:
                att = m.decoder(enc, enc_lens, tokens, token_lens, train=True)
            loss, _ = hybrid_loss(logits, enc_lens, att, tokens, token_lens,
                                  cfg.model.ctc_weight,
                                  ctc_impl=cfg.model.ctc_impl)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(0)
    with mesh:
        batch = shard_batch(
            mesh, (jnp.asarray(audio), jnp.asarray(audio_lens),
                   jnp.asarray(tokens), jnp.asarray(token_lens)))
        for _ in range(2):
            params, opt_state, loss = train_step(params, opt_state, *batch,
                                                 key)
        loss.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = train_step(params, opt_state, *batch,
                                                 key)
        loss.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
    assert bool(jnp.isfinite(loss)), f"non-finite loss {loss}"
    return B * utt_seconds / dt, dt


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dp", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--small", action="store_true",
                    help="tiny model/audio (CPU wiring check)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--per-device-batch", type=int, default=None)
    ap.add_argument("--utt-seconds", type=float, default=None)
    ap.add_argument("--multihost", action="store_true")
    args = ap.parse_args(argv)

    import os

    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the image's sitecustomize force-registers the TPU plugin and
        # overrides the env var; pin CPU back for the virtual-device check
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        from pytorch_end2end_speech_recognition_tpu.parallel.mesh import (
            initialize_multihost,
        )

        initialize_multihost()
    import jax

    small = args.small or jax.default_backend() == "cpu"
    pdb = args.per_device_batch or (2 if small else 16)
    sec = args.utt_seconds or (1.0 if small else 30.0)

    results = {}
    for dp in args.dp:
        if dp > len(jax.devices()):
            print(f"[bench_scaling] skip dp={dp}: only "
                  f"{len(jax.devices())} devices", file=sys.stderr)
            continue
        tput, dt = bench_dp(dp, small, args.iters, pdb, sec)
        results[dp] = tput
        print(json.dumps({
            "metric": "train_step_audio_s_per_s", "dp": dp,
            "value": round(tput, 2), "unit": "audio-seconds/second",
            "step_ms": round(dt * 1e3, 2),
        }), flush=True)
    if 1 in results and len(results) > 1:
        base = results[1]
        for dp, tput in sorted(results.items()):
            if dp == 1:
                continue
            eff = tput / (base * dp)
            print(json.dumps({
                "metric": "dp_scaling_efficiency", "dp": dp,
                "value": round(eff, 4), "unit": "fraction",
                "target": 0.85,
            }), flush=True)


if __name__ == "__main__":
    main()
