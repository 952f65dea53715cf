"""RNN-LM training entry point.

Capability parity: the reference genre's `train_lm` (SURVEY.md §3.4): trains
an LSTM LM on manifest transcripts, reports dev perplexity, saves a
checkpoint consumed by beam-search shallow fusion.

    python -m pytorch_end2end_speech_recognition_tpu.cli.train_lm \
        --config cfg.json --out lm_ckpt [--steps 10000]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np


def batches(token_lists, batch_size, max_len, rng):
    order = rng.permutation(len(token_lists))
    for s in range(0, len(order) - batch_size + 1, batch_size):
        idx = order[s : s + batch_size]
        U = max(1, min(max_len, max(len(token_lists[i]) for i in idx)))
        toks = np.zeros((batch_size, U), np.int32)
        lens = np.zeros((batch_size,), np.int32)
        for r, i in enumerate(idx):
            t = token_lists[i][:U]
            toks[r, : len(t)] = t
            lens[r] = len(t)
        yield toks, lens


def train_lm(cfg, tok, texts, dev_texts, out_dir: str, steps: int,
             batch_size: int = 32, lr: float = 1e-3, seed: int = 0,
             log_every: int = 200):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from pytorch_end2end_speech_recognition_tpu.models.lm import (
        build_lm,
        lm_loss,
    )
    from pytorch_end2end_speech_recognition_tpu.training.checkpoint import (
        save_checkpoint,
    )

    cfg.model.vocab_size = tok.vocab_size
    lm = build_lm(cfg.model, nnx.Rngs(seed))
    graphdef, params = nnx.split(lm, nnx.Param)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(lr))
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, toks, lens):
        def loss_fn(p):
            model = nnx.merge(graphdef, p)
            loss, count = lm_loss(model, toks, lens)
            return loss, count

        (loss, count), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_fn(params, toks, lens):
        model = nnx.merge(graphdef, params)
        loss, count = lm_loss(model, toks, lens)
        return loss * count, count

    token_lists = [tok.encode(t) for t in texts if t.strip()]
    dev_lists = [tok.encode(t) for t in dev_texts if t.strip()]
    rng = np.random.default_rng(seed)
    step, t0 = 0, time.time()
    while step < steps:
        for toks, lens in batches(token_lists, batch_size, 256, rng):
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(toks), jnp.asarray(lens)
            )
            step += 1
            if step % log_every == 0:
                print(f"[lm] step={step} loss={float(loss):.4f} "
                      f"wall={time.time()-t0:.1f}s", file=sys.stderr)
            if step >= steps:
                break
    # dev perplexity
    tot, cnt = 0.0, 0
    eval_bs = max(1, min(batch_size, len(dev_lists)))
    for toks, lens in batches(dev_lists, eval_bs, 256,
                              np.random.default_rng(0)):
        s, c = eval_fn(params, jnp.asarray(toks), jnp.asarray(lens))
        tot += float(s)
        cnt += int(c)
    ppl = float(np.exp(tot / max(cnt, 1)))
    print(f"[lm] dev perplexity {ppl:.2f}", file=sys.stderr)
    save_checkpoint(out_dir, "lm", params=params, opt_state=opt_state,
                    step=steps, best_wer=ppl, cfg=cfg)
    return params, ppl


def load_lm(ckpt_dir: str, cfg, tok):
    """Restore a language model (RNN or transformer) for shallow fusion."""
    import optax
    from flax import nnx

    from pytorch_end2end_speech_recognition_tpu.models.lm import build_lm
    from pytorch_end2end_speech_recognition_tpu.training.checkpoint import (
        load_checkpoint,
    )

    cfg.model.vocab_size = tok.vocab_size
    lm = build_lm(cfg.model, nnx.Rngs(0))
    graphdef, params = nnx.split(lm, nnx.Param)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    data = load_checkpoint(ckpt_dir, "lm", params_like=params,
                           opt_state_like=tx.init(params))
    return nnx.merge(graphdef, data["params"])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--extra-text", default=None,
                    help="optional text file with one sentence per line")
    ap.add_argument("--set", action="append", default=[], metavar="K=V")
    args = ap.parse_args(argv)
    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
        maybe_force_cpu,
    )

    maybe_force_cpu()
    enable_compilation_cache()

    from pytorch_end2end_speech_recognition_tpu.cli.train import load_config
    from pytorch_end2end_speech_recognition_tpu.data.manifest import read_manifest
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        load_for_config,
    )
    from pytorch_end2end_speech_recognition_tpu.utils.config import parse_overrides

    cfg = parse_overrides(load_config(args.config), args.set)
    tok = load_for_config(cfg)
    texts = [u.text for u in read_manifest(cfg.data.train_manifest)]
    if args.extra_text:
        texts += Path(args.extra_text).read_text().splitlines()
    dev_texts = (
        [u.text for u in read_manifest(cfg.data.dev_manifest)]
        if cfg.data.dev_manifest else texts[:200]
    )
    train_lm(cfg, tok, texts, dev_texts, args.out, args.steps,
             args.batch_size, args.lr)


if __name__ == "__main__":
    main()
