"""Quality run for the synthetic-digits recipe (r1 VERDICT item 10).

Generates a speaker-varied digits corpus (speaker_jitter=1.0, 2000 train
utts), trains a rung-4-style conformer stack via the train CLI, then
beam-decodes dev and test via the decode CLI. Target: dev beam WER < 0.05
(r1 snapshot: 0.185 with train WER 0.00 — pure memorization).

Usage: python tools/quality_digits.py [workdir] [steps]
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root
import json
import sys
import time
from pathlib import Path

from pytorch_end2end_speech_recognition_tpu.data.synthetic import (
    make_digits_corpus,
)
from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig


def build_cfg(workdir: Path, corpus_dir: Path, steps: int) -> AsrConfig:
    import jax

    cfg = AsrConfig(name="digits_quality")
    cfg.model.encoder = "conformer"
    cfg.model.encoder_layers = 8
    cfg.model.encoder_dim = 256
    cfg.model.encoder_ffn_dim = 1024
    cfg.model.encoder_heads = 4
    cfg.model.subsample_channels = 64
    cfg.model.encoder_dropout = 0.1
    cfg.model.decoder = "transformer"
    cfg.model.decoder_layers = 2
    cfg.model.decoder_dim = 256
    cfg.model.embed_dim = 256
    cfg.model.attention_dim = 256
    cfg.model.ctc_weight = 0.3
    cfg.model.label_smoothing = 0.1
    cfg.model.dtype = "bfloat16"
    cfg.model.residual_dtype = "bfloat16"
    on_tpu = jax.default_backend() not in ("cpu",)
    # SpecAugment defaults (2x27-mel freq masks, 2x100-frame time masks) are
    # tuned for real speech's redundancy; the synthetic digit tones are
    # NARROWBAND melodies, so a single freq mask erases a tone outright and
    # CTC cannot learn at all (bisected r3: loss 1.47 stuck vs 0.62 falling
    # at step 300). Mild masks keep the regularizer without destroying the
    # signal; speaker_jitter + dropout carry the generalization load.
    cfg.frontend.spec_augment = True
    cfg.frontend.freq_mask_param = 6
    cfg.frontend.n_freq_masks = 1
    cfg.frontend.time_mask_param = 12
    cfg.frontend.n_time_masks = 1
    cfg.frontend.impl = "pallas" if on_tpu else "jnp"
    cfg.model.ctc_impl = "pallas" if on_tpu else "xla"
    cfg.model.attn_impl = "pallas" if on_tpu else "xla"
    cfg.data.train_manifest = str(corpus_dir / "train.jsonl")
    cfg.data.dev_manifest = str(corpus_dir / "dev.jsonl")
    cfg.data.test_manifest = str(corpus_dir / "test.jsonl")
    cfg.data.batch_size = 32
    # DataConfig's default batch_frames (160k samples = 10 s of audio) is a
    # CPU-test budget: it capped this recipe's effective batch at 2-11 utts,
    # which both destabilized training (tiny noisy grads at peak LR) and
    # left the TPU idle. 4M samples lets batch_size=32 bind in every bucket.
    cfg.data.batch_frames = 4_000_000
    cfg.train.steps = steps
    cfg.train.eval_every = max(500, steps // 6)
    cfg.train.lr = 1.5e-3
    cfg.train.schedule = "noam"
    cfg.train.warmup_steps = min(1000, steps // 3)
    cfg.train.checkpoint_dir = str(workdir / "ckpt")
    cfg.train.metrics_path = str(workdir / "metrics.jsonl")
    cfg.train.log_every = 200
    cfg.decode.mode = "beam"
    cfg.decode.beam_size = 8
    return cfg


def main():
    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/digits_quality")
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    overrides = sys.argv[3:]  # k=v applied via cfg.override
    workdir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    corpus_dir = workdir / "corpus"
    if not (corpus_dir / "train.jsonl").exists():
        make_digits_corpus(corpus_dir, n_train=2000, n_dev=100, n_test=100,
                           min_digits=1, max_digits=7, speaker_jitter=1.0)
        print(f"corpus: {time.time()-t0:.0f}s", flush=True)
    cfg = build_cfg(workdir, corpus_dir, steps)
    for kv in overrides:
        k, v = kv.split("=", 1)
        cfg.override(k, v)
    cfg_path = workdir / "config.json"
    cfg_path.write_text(cfg.to_json())

    from pytorch_end2end_speech_recognition_tpu.cli import decode, train

    train.main(["--config", str(cfg_path)])
    print(f"train done: {time.time()-t0:.0f}s", flush=True)
    for split, mani in (("dev", cfg.data.dev_manifest),
                        ("test", cfg.data.test_manifest)):
        out = workdir / f"{split}_beam.jsonl"
        decode.main(["--config", str(cfg_path), "--checkpoint-tag", "best",
                     "--manifest", mani, "--mode", "beam",
                     "--nbest-out", str(out)])
        print(f"[{split} beam decode done: {time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
