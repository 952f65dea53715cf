"""A/B parity probe: Pallas vs XLA impls on a real digits batch (TPU).

The r3 quality run collapsed on TPU (dev WER 1.0) while the same recipe's
CPU bisect learned — this probe isolates whether any Pallas kernel path
(frontend / ctc / attention) diverges from the XLA reference on the exact
training batch, in loss value AND gradients.

Usage: python tools/probe_impl_parity.py [corpus_dir] [dtype]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    corpus = Path(sys.argv[1] if len(sys.argv) > 1 else
                  "/tmp/digits_quality_r3/corpus")
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from tools.quality_digits import build_cfg
    from pytorch_end2end_speech_recognition_tpu.data.dataset import (
        BucketedLoader,
    )
    from pytorch_end2end_speech_recognition_tpu.data.manifest import (
        read_manifest,
    )
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        build_tokenizer,
    )
    from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
    from pytorch_end2end_speech_recognition_tpu.training.losses import (
        hybrid_loss,
    )

    cfg = build_cfg(Path("/tmp/probe_parity"), corpus, 100)
    cfg.model.dtype = dtype
    cfg.model.residual_dtype = dtype
    train_utts = read_manifest(cfg.data.train_manifest)
    tok = build_tokenizer(cfg.data.tokenizer, [u.text for u in train_utts])
    cfg.model.vocab_size = tok.vocab_size
    loader = BucketedLoader(train_utts, tok, cfg.data,
                            sample_rate=cfg.frontend.sample_rate, train=True)
    batch = next(iter(loader))
    audio = jnp.asarray(batch.audio)
    audio_lens = jnp.asarray(batch.audio_lens)
    tokens = jnp.asarray(batch.tokens)
    token_lens = jnp.asarray(batch.token_lens)
    print(f"batch: audio {audio.shape} tokens {tokens.shape} "
          f"lens {np.asarray(audio_lens)[:6]} ... dtype={dtype}", flush=True)

    variants = {
        "all_xla": dict(frontend="jnp", ctc="xla", attn="xla"),
        "frontend_pallas": dict(frontend="pallas", ctc="xla", attn="xla"),
        "ctc_pallas": dict(frontend="jnp", ctc="pallas", attn="xla"),
        "attn_pallas": dict(frontend="jnp", ctc="xla", attn="pallas"),
        "all_pallas": dict(frontend="pallas", ctc="pallas", attn="pallas"),
    }

    results = {}
    for name, v in variants.items():
        cfg.frontend.impl = v["frontend"]
        cfg.model.ctc_impl = v["ctc"]
        cfg.model.attn_impl = v["attn"]
        model = AsrModel(cfg, nnx.Rngs(0))
        graphdef, params, rest = nnx.split(model, nnx.Param, ...)
        rng = jax.random.PRNGKey(7)

        def loss_fn(params):
            m = nnx.merge(graphdef, params, rest)
            k_spec, k_dec = jax.random.split(rng)
            enc, enc_lens = m.encode(audio, audio_lens, train=True,
                                     rng=k_spec)
            logits = m.ctc_logits(enc)
            att_logps = m.decoder(enc, enc_lens, tokens, token_lens,
                                  train=True, scheduled_sampling=0.0,
                                  rng=k_dec)
            loss, metrics = hybrid_loss(
                logits, enc_lens, att_logps, tokens, token_lens,
                cfg.model.ctc_weight, cfg.model.label_smoothing,
                ctc_impl=cfg.model.ctc_impl)
            return loss, metrics

        (loss, metrics), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params)
        leaves = jax.tree_util.tree_leaves(grads)
        gnorm = float(jnp.sqrt(sum(jnp.sum(g[...].astype(jnp.float32) ** 2)
                                   for g in leaves)))
        flat = jnp.concatenate([jnp.ravel(g[...]).astype(jnp.float32)
                                for g in leaves])
        results[name] = (float(loss), float(metrics["ctc_loss"]),
                         float(metrics["att_loss"]), gnorm, flat)
        print(f"{name:18s} loss={float(loss):.6f} "
              f"ctc={float(metrics['ctc_loss']):.6f} "
              f"att={float(metrics['att_loss']):.6f} gnorm={gnorm:.4f}",
              flush=True)

    base = results["all_xla"]
    for name, r in results.items():
        if name == "all_xla":
            continue
        gdiff = float(jnp.linalg.norm(r[4] - base[4]) /
                      (jnp.linalg.norm(base[4]) + 1e-12))
        print(f"{name:18s} dloss={r[0]-base[0]:+.6f} "
              f"dctc={r[1]-base[1]:+.6f} datt={r[2]-base[2]:+.6f} "
              f"grad_rel_l2={gdiff:.6f}", flush=True)


if __name__ == "__main__":
    main()
