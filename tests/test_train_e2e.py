"""End-to-end smoke: overfit BiLSTM+CTC on the synthetic digits corpus to
near-zero WER (SURVEY.md §4 'End-to-end smoke', BASELINE.json:7 config 1),
plus checkpoint resume and determinism."""

import jax
import numpy as np
import pytest

from pytorch_end2end_speech_recognition_tpu.data.dataset import BucketedLoader
from pytorch_end2end_speech_recognition_tpu.data.manifest import read_manifest
from pytorch_end2end_speech_recognition_tpu.data.tokenizer import CharTokenizer
from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig


def _cfg(tmp_path):
    cfg = AsrConfig()
    cfg.model.encoder = "blstm"
    cfg.model.encoder_layers = 2
    cfg.model.encoder_dim = 96
    cfg.model.ctc_weight = 1.0
    cfg.model.dtype = "float32"
    cfg.frontend.spec_augment = False
    cfg.data.batch_size = 8
    cfg.data.n_length_buckets = 2
    cfg.train.lr = 1e-3
    cfg.train.schedule = "constant"
    cfg.train.log_every = 100
    cfg.train.metrics_path = str(tmp_path / "metrics.jsonl")
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    return cfg


@pytest.fixture(scope="module")
def trained(trained_blstm):
    cfg, tok, utts, loader, solver = trained_blstm  # session-scoped (conftest)
    return cfg, tok, loader, solver


def test_overfit_wer(trained):
    cfg, tok, loader, solver = trained
    assert solver.evaluate(loader) < 0.1


def test_checkpoint_resume_exact(trained):
    cfg, tok, loader, solver = trained
    wer0 = solver.evaluate(loader)
    solver.save_checkpoint("last")
    fresh = Solver(cfg, tok)
    assert fresh.evaluate(loader) > 0.5  # untrained is bad
    fresh.load_checkpoint("last")
    assert fresh.step == solver.step
    assert abs(fresh.evaluate(loader) - wer0) < 1e-9


def test_first_step_deterministic(digits_corpus, tmp_path):
    cfg = _cfg(tmp_path)
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])
    losses = []
    for _ in range(2):
        loader = BucketedLoader(utts, tok, cfg.data)
        solver = Solver(cfg, tok)
        h = solver.fit(loader, steps=1)
        batch = next(iter(loader.epoch(0)))
        arrays = solver._put(batch)
        key = jax.random.PRNGKey(0)
        _, _, _, metrics = solver._train_step(
            solver.params, solver.opt_state, solver.rest, *arrays, key,
            jax.numpy.asarray(1.0, jax.numpy.float32),
        )
        losses.append(float(metrics["loss"]))
    assert losses[0] == losses[1]


@pytest.mark.slow
def test_resume_continues_exactly(digits_corpus, tmp_path):
    """Training 12 steps, checkpointing, and resuming 6 more in a fresh
    process must equal 18 uninterrupted steps bit-for-bit: the checkpoint
    carries the PRNG key and the loader cursor (SURVEY.md §5.4)."""
    cfg = _cfg(tmp_path / "a")
    cfg.train.checkpoint_dir = str(tmp_path / "a" / "ckpt")
    cfg.train.metrics_path = str(tmp_path / "a" / "m.jsonl")
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])

    s1 = Solver(cfg, tok)
    s1.fit(BucketedLoader(utts, tok, cfg.data), steps=18)
    ref = jax.tree_util.tree_leaves(s1.params)

    cfg2 = _cfg(tmp_path / "b")
    cfg2.train.checkpoint_dir = str(tmp_path / "b" / "ckpt")
    cfg2.train.metrics_path = str(tmp_path / "b" / "m.jsonl")
    s2 = Solver(cfg2, tok)
    s2.fit(BucketedLoader(utts, tok, cfg2.data), steps=12)
    s2.save_checkpoint("last")
    s3 = Solver(cfg2, tok)
    s3.load_checkpoint("last")
    assert s3.step == 12
    s3.fit(BucketedLoader(utts, tok, cfg2.data), steps=18)
    got = jax.tree_util.tree_leaves(s3.params)
    for a, b in zip(ref, got):
        v_a = a[...]
        v_b = b[...]
        np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))


@pytest.mark.slow  # ~42s, compile-dominated; the hybrid lstm-decoder path
# stays default-covered by tests/test_beam.py's oracle-equivalence models
def test_hybrid_attention_training_steps(digits_corpus, tmp_path):
    """Hybrid CTC+attention train step runs and improves loss."""
    cfg = _cfg(tmp_path)
    cfg.model.ctc_weight = 0.3
    cfg.model.decoder_layers = 1
    cfg.train.lr = 1e-3
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])
    loader = BucketedLoader(utts, tok, cfg.data)
    solver = Solver(cfg, tok)
    hist = solver.fit(loader, steps=30)
    assert hist["loss"][-1] < hist["loss"][0] * 1.05


@pytest.mark.slow
def test_hybrid_transformer_decoder_training_steps(digits_corpus, tmp_path):
    """Hybrid training with the transformer decoder runs and improves loss."""
    cfg = _cfg(tmp_path)
    cfg.model.ctc_weight = 0.3
    cfg.model.decoder = "transformer"
    cfg.model.decoder_layers = 2
    cfg.model.decoder_dim = 64
    cfg.model.decoder_heads = 2
    cfg.train.lr = 1e-3
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])
    loader = BucketedLoader(utts, tok, cfg.data)
    solver = Solver(cfg, tok)
    hist = solver.fit(loader, steps=60)
    assert hist["loss"][-1] < hist["loss"][0] * 1.05


def test_transcribe_cli(trained, digits_corpus, tmp_path, capsys):
    """cli/transcribe: single-wav inference (batch + streaming) against a
    trained checkpoint (genre 'recognize.py' parity)."""
    import json as _json
    from pathlib import Path

    from pytorch_end2end_speech_recognition_tpu.cli import transcribe
    from pytorch_end2end_speech_recognition_tpu.data.manifest import (
        read_manifest,
    )
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        CharTokenizer,
    )

    cfg, tok, loader, solver = trained
    tok_path = tmp_path / "tok.json"
    tok.save(tok_path)
    cfg.data.tokenizer_path = str(tok_path)
    solver.save_checkpoint("last")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    utt = read_manifest(digits_corpus["train"])[0]
    transcribe.main(["--config", str(cfg_path), "--checkpoint-tag", "last",
                     utt.audio])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = _json.loads(out)
    assert rec["file"] == utt.audio
    # overfit model transcribes its own training utterance
    assert rec["text"] == utt.text
    # streaming path produces a transcript too (approximate at boundaries)
    transcribe.main(["--config", str(cfg_path), "--checkpoint-tag", "last",
                     "--streaming", "--chunk-s", "1.0", utt.audio])
    rec2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(rec2["text"], str) and rec2["text"]


def test_grad_accumulation(digits_corpus, tmp_path):
    """grad_accum_steps=2: params change only on every 2nd step, and the
    loss still improves (optax.MultiSteps wiring through the solver)."""
    cfg = _cfg(tmp_path)
    cfg.train.grad_accum_steps = 2
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])
    loader = BucketedLoader(utts, tok, cfg.data)
    solver = Solver(cfg, tok)
    p0 = np.concatenate([
        np.asarray(v[...]).ravel()[:4]
        for v in jax.tree_util.tree_leaves(solver.params)])
    solver.fit(loader, steps=1)
    p1 = np.concatenate([
        np.asarray(v[...]).ravel()[:4]
        for v in jax.tree_util.tree_leaves(solver.params)])
    np.testing.assert_array_equal(p0, p1)  # mid-accumulation: no update yet
    solver.fit(loader, steps=2)
    p2 = np.concatenate([
        np.asarray(v[...]).ravel()[:4]
        for v in jax.tree_util.tree_leaves(solver.params)])
    assert np.abs(p2 - p1).max() > 0  # update applied on the 2nd micro-step
    cfg.train.log_every = 5  # >1 history point within the short fit below
    hist = solver.fit(loader, steps=40)  # CTC falls fast from init; 40 is
    assert len(hist["loss"]) > 2  # plenty (was 120: ~15s CPU)
    assert hist["loss"][-1] < hist["loss"][0]


@pytest.mark.slow  # hybrid fit + streaming beam compile
def test_transcribe_cli_streaming_beam(trained_blstm, tmp_path, capsys):
    """cli/transcribe --streaming --mode beam: greedy partials + chunk-final
    joint beam through the CLI wiring (models/streaming tested separately)."""
    import copy
    import json as _json

    from pytorch_end2end_speech_recognition_tpu.cli import transcribe

    cfg, tok, utts, loader, _ = trained_blstm
    cfg = copy.deepcopy(cfg)
    cfg.model.ctc_weight = 0.3
    cfg.model.decoder_layers = 1
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt_sb")
    cfg.train.metrics_path = str(tmp_path / "msb.jsonl")
    cfg.decode.beam_size = 4
    cfg.decode.pre_beam_k = 6
    solver = Solver(cfg, tok)
    solver.fit(BucketedLoader(utts, tok, cfg.data), steps=5)
    solver.save_checkpoint("last")
    tok.save(tmp_path / "tok.json")
    cfg.data.tokenizer_path = str(tmp_path / "tok.json")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    transcribe.main(["--config", str(cfg_path), "--checkpoint-tag", "last",
                     "--streaming", "--mode", "beam", "--chunk-s", "1.0",
                     utts[0].audio])
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["file"] == utts[0].audio
    assert isinstance(rec["text"], str)
