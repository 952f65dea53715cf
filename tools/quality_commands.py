"""Realistic-regime quality + LM-fusion evidence run (r4 VERDICT next-round
task 2; BASELINE.json:10).

The narrowband-tone corpora had a difficulty cliff (dev WER 0.006 -> 0.75
between noise 0.03 and 0.07) and ~100-utterance dev sets where the fusion
gain was ~2 words. This run uses the formant-synthesis commands corpus
(data/synthetic.make_commands_corpus): >=100-word grammar, speech-like
spectra, broadband/babble noise whose SNR moves WER smoothly, and 600-utt
dev/test splits so sub-percent WER deltas resolve.

Pipeline:
  1. generate the corpus at `snr` dB (+ matched harder dev/test sets at
     `eval_snrs` — decode-time noise mismatch shifts the operating point
     WITHOUT retraining, so the 5-15%-WER fusion regime is found cheaply)
  2. train the conformer recipe (tools/quality_digits.build_cfg shapes)
  3. train a char RNN-LM on the training transcripts
  4. pick the hardest eval set whose lm_weight=0 dev WER lands in
     [0.03, 0.25]; sweep lm_weight there with PER-UTTERANCE error records
  5. paired bootstrap (10k resamples) on best-weight vs no-LM so the gain
     carries a confidence interval, not just a point delta
  6. decode test at the best weight; record trained-model beam RTF
     (EOS-exit, batch-amortized) — the honest companion to benchmarks.py's
     untrained worst case (r4 VERDICT weak item 3)

Writes bench_results/r5_quality.json.
Usage: python tools/quality_commands.py [workdir] [steps] [k=v ...]
  knobs: snr=8 var=1.0 eval_snrs=4,0 weights=0,0.1,0.2,0.3,0.5,0.7
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
sys.path.insert(0, str(Path(__file__).resolve().parent))         # tools/
import json
import time

import numpy as np

from pytorch_end2end_speech_recognition_tpu.data.synthetic import (
    make_commands_corpus,
)
from quality_digits import build_cfg


def decode_per_utt(cfg, tok, lm, manifest, weight):
    """Beam-decode one manifest at one lm_weight; returns per-utterance
    (word_errors, ref_words) arrays plus aggregate rates and wall time."""
    import copy

    from pytorch_end2end_speech_recognition_tpu.data.dataset import (
        BucketedLoader,
    )
    from pytorch_end2end_speech_recognition_tpu.data.manifest import (
        read_manifest,
    )
    from pytorch_end2end_speech_recognition_tpu.decode.beam import (
        BeamSearchDecoder,
    )
    from pytorch_end2end_speech_recognition_tpu.metrics.wer import (
        ErrorStats,
        edit_distance,
    )

    model = decode_per_utt._model
    utts = read_manifest(manifest)
    loader = BucketedLoader(utts, tok, cfg.data,
                            sample_rate=cfg.frontend.sample_rate, train=False)
    dcfg = copy.deepcopy(cfg.decode)
    dcfg.lm_weight = float(weight)
    beam = BeamSearchDecoder(model, dcfg, lm=lm if weight > 0 else None)
    errs, refs = [], []
    cer = ErrorStats()
    audio_s = 0.0
    t0 = time.time()
    for batch in loader.epoch(0):
        results = beam.decode_batch(batch, tok)
        for i, r in enumerate(results):
            if batch.audio_lens[i] == 0:
                continue
            hyp = r[0]["text"] if r else ""
            ref = batch.texts[i]
            errs.append(edit_distance(ref.split(), hyp.split()))
            refs.append(len(ref.split()))
            cer.update(list(ref.replace(" ", "")),
                       list(hyp.replace(" ", "")))
            audio_s += float(batch.audio_lens[i]) / cfg.frontend.sample_rate
    wall = time.time() - t0
    errs, refs = np.asarray(errs), np.asarray(refs)
    return {
        "wer": round(float(errs.sum() / max(refs.sum(), 1)), 4),
        "cer": round(cer.rate, 4),
        "ser": round(float((errs > 0).mean()), 4),
        "n_utts": int(len(errs)),
        "n_words": int(refs.sum()),
        "word_errors": int(errs.sum()),
        "wall_s": round(wall, 1),
        "audio_s": round(audio_s, 1),
        "_errs": errs, "_refs": refs,
    }


def paired_bootstrap(errs_a, errs_b, refs, n=10000, seed=0):
    """95% CI for WER(a) - WER(b) over utterance resamples + P(a better)."""
    rng = np.random.default_rng(seed)
    m = len(refs)
    idx = rng.integers(0, m, size=(n, m))
    wa = errs_a[idx].sum(axis=1) / refs[idx].sum(axis=1)
    wb = errs_b[idx].sum(axis=1) / refs[idx].sum(axis=1)
    d = wa - wb
    return {
        "delta_wer": round(float(errs_a.sum() / refs.sum()
                                 - errs_b.sum() / refs.sum()), 5),
        "ci95": [round(float(np.percentile(d, 2.5)), 5),
                 round(float(np.percentile(d, 97.5)), 5)],
        "p_a_worse": round(float((d > 0).mean()), 4),
    }


def main():
    workdir = Path(sys.argv[1] if len(sys.argv) > 1
                   else "/tmp/commands_quality")
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    snr, var = 8.0, 1.0
    eval_snrs = [4.0, 0.0]
    weights = [0.0, 0.1, 0.2, 0.3, 0.5, 0.7]
    n_train, n_eval = 4000, 600
    overrides = []
    for kv in sys.argv[3:]:
        k, v = kv.split("=", 1)
        if k == "snr":
            snr = float(v)
        elif k == "var":
            var = float(v)
        elif k == "eval_snrs":
            eval_snrs = [float(s) for s in v.split(",")] if v else []
        elif k == "weights":
            weights = [float(w) for w in v.split(",")]
        elif k == "ntrain":
            n_train = int(v)
        elif k == "neval":
            n_eval = int(v)
        else:
            overrides.append(kv)
    workdir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    # ---- 1. corpora
    corpus_dir = workdir / "corpus"
    if not (corpus_dir / "train.jsonl").exists():
        make_commands_corpus(corpus_dir, n_train=n_train, n_dev=n_eval,
                             n_test=n_eval, snr_db=snr, speaker_var=var)
        print(f"corpus(snr={snr}): {time.time()-t0:.0f}s", flush=True)
    hard_sets = {}
    for s in eval_snrs:
        d = workdir / f"corpus_snr{s:g}"
        if not (d / "dev.jsonl").exists():
            make_commands_corpus(d, n_train=0, n_dev=n_eval, n_test=n_eval,
                                 snr_db=s, speaker_var=var,
                                 seed=1000 + int(10 * s))
            print(f"eval corpus snr={s}: {time.time()-t0:.0f}s", flush=True)
        hard_sets[s] = d

    cfg = build_cfg(workdir, corpus_dir, steps)
    cfg.name = "commands_quality"
    for kv in overrides:
        k, v = kv.split("=", 1)
        cfg.override(k, v)
    cfg_path = workdir / "config.json"
    cfg_path.write_text(cfg.to_json())

    # ---- 2./3. AM + LM
    from pytorch_end2end_speech_recognition_tpu.cli import train, train_lm
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        load_for_config,
    )
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
    from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig

    if not (Path(cfg.train.checkpoint_dir) / "best").exists():
        train.main(["--config", str(cfg_path)])
        print(f"train done: {time.time()-t0:.0f}s", flush=True)
    cfg = AsrConfig.from_json(cfg_path.read_text())

    lm_dir = workdir / "lm"
    if not (lm_dir / "lm").exists():
        train_lm.main(["--config", str(cfg_path), "--out", str(lm_dir),
                       "--steps", "3000"])
        print(f"lm done: {time.time()-t0:.0f}s", flush=True)

    tok = load_for_config(cfg)
    lm = train_lm.load_lm(str(lm_dir), cfg, tok)
    solver = Solver(cfg, tok)
    solver.load_checkpoint("best")
    decode_per_utt._model = solver.merged_model()

    # ---- 4. find the fusion operating point: train-SNR dev first, then
    # harder sets, hardest acceptable wins
    candidates = [("train_snr", snr, corpus_dir)] + [
        (f"snr{s:g}", s, d) for s, d in sorted(hard_sets.items(),
                                               key=lambda kv: -kv[0])
    ]
    probe = {}
    chosen = None
    for name, s, d in candidates:
        r = decode_per_utt(cfg, tok, None, str(d / "dev.jsonl"), 0.0)
        probe[name] = {k: v for k, v in r.items()
                       if not k.startswith("_")}
        print(f"[probe] {name} (snr={s}): wer={r['wer']} "
              f"({r['word_errors']}/{r['n_words']} words, "
              f"{r['n_utts']} utts)", flush=True)
        if 0.03 <= r["wer"] <= 0.25:
            chosen = (name, s, d, r)
    if chosen is None:  # fall back to whichever is closest to 10%
        name, s, d = min(
            candidates,
            key=lambda c: abs(probe[c[0]]["wer"] - 0.10))
        chosen = (name, s, d,
                  decode_per_utt(cfg, tok, None, str(d / "dev.jsonl"), 0.0))
    name, s, d, base = chosen
    print(f"[fusion] operating point: {name} (snr={s}), "
          f"dev wer={base['wer']}", flush=True)

    # ---- sweep lm_weight on the chosen dev set
    dev_sweep = {0.0: base}
    for w in weights:
        if w == 0.0:
            continue
        dev_sweep[w] = decode_per_utt(cfg, tok, lm, str(d / "dev.jsonl"), w)
        print(f"[fusion] lm_weight={w}: wer={dev_sweep[w]['wer']} "
              f"({dev_sweep[w]['word_errors']} errs)", flush=True)
    best_w = min(dev_sweep, key=lambda w: (dev_sweep[w]["wer"], w))

    # ---- 5. significance: paired bootstrap best vs 0
    boot = paired_bootstrap(dev_sweep[best_w]["_errs"],
                            dev_sweep[0.0]["_errs"],
                            dev_sweep[0.0]["_refs"])
    print(f"[fusion] best_w={best_w} dWER={boot['delta_wer']} "
          f"CI95={boot['ci95']} P(worse)={boot['p_a_worse']}", flush=True)

    # ---- 6. test at best weight (+ 0 contrast) on the same eval set
    test = {}
    for w in sorted({0.0, best_w}):
        test[w] = decode_per_utt(cfg, tok, lm if w > 0 else None,
                                 str(d / "test.jsonl"), w)
        print(f"[test] lm_weight={w}: wer={test[w]['wer']}", flush=True)
    tboot = paired_bootstrap(test[best_w]["_errs"], test[0.0]["_errs"],
                             test[0.0]["_refs"]) if best_w != 0.0 else None

    # trained-model EOS-exit beam RTF from the no-LM test decode
    rtf = test[0.0]["wall_s"] / max(test[0.0]["audio_s"], 1e-6)

    def clean(r):
        return {k: v for k, v in r.items() if not k.startswith("_")}

    rec = {
        "recipe": "commands_quality (formant pseudo-speech, babble noise)",
        "corpus": {"snr_db": snr, "speaker_var": var, "n_train": n_train,
                   "n_dev": n_eval, "n_test": n_eval,
                   "lexicon_words": 110},
        "steps": steps,
        "probe_dev_wer_by_set": probe,
        "fusion_eval_set": {"name": name, "snr_db": s},
        "dev_sweep": {str(w): clean(r) for w, r in dev_sweep.items()},
        "best_lm_weight": best_w,
        "dev_bootstrap_best_vs_nolm": boot,
        "test": {str(w): clean(r) for w, r in test.items()},
        "test_bootstrap_best_vs_nolm": tboot,
        "trained_beam_rtf_batch_amortized": round(rtf, 4),
        "wall_s": round(time.time() - t0, 1),
    }
    out_path = (Path(__file__).resolve().parent.parent / "bench_results"
                / "r5_quality.json")
    out_path.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec, indent=2), flush=True)


if __name__ == "__main__":
    main()
