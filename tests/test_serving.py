"""AOT serving-bundle tests: jax.export round-trip of the jitted
transcription function (greedy CTC and full joint beam), bucket selection,
and vocab-hash integrity (serving/export.py)."""

import numpy as np
import pytest

from pytorch_end2end_speech_recognition_tpu.data.audio import load_audio
from pytorch_end2end_speech_recognition_tpu.data.dataset import BucketedLoader
from pytorch_end2end_speech_recognition_tpu.data.manifest import read_manifest
from pytorch_end2end_speech_recognition_tpu.data.tokenizer import CharTokenizer
from pytorch_end2end_speech_recognition_tpu.serving import (
    export_bundle,
    load_bundle,
)
from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig


@pytest.fixture(scope="module")
def trained_for_export(tmp_path_factory, digits_corpus):
    tmp = tmp_path_factory.mktemp("export")
    # mirror test_train_e2e._cfg exactly: in a full-suite run the 30-step
    # fit then reuses the already-warm jitted train step (the compile, not
    # the export, is what costs ~70 s here — export itself is ~0.5 s)
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
    cfg.train.log_every = 1000
    cfg.train.metrics_path = str(tmp / "m.jsonl")
    cfg.train.checkpoint_dir = str(tmp / "ckpt")
    cfg.decode.beam_size = 4
    cfg.decode.pre_beam_k = 6
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])
    solver = Solver(cfg, tok)
    solver.fit(BucketedLoader(utts, tok, cfg.data), steps=30)  # any checkpoint works: tests assert bundle==live, not quality
    solver.save_checkpoint("best")
    return cfg, tok, utts, solver


@pytest.fixture(scope="module")
def greedy_bundle(trained_for_export, tmp_path_factory):
    cfg, tok, utts, solver = trained_for_export
    # ONE artifact: each export() pays a full lower+serialize (~25 s CPU)
    out = export_bundle(cfg, tok, tmp_path_factory.mktemp("sb") / "bundle",
                        checkpoint_tag="best", mode="greedy",
                        batch_sizes=(2,), seconds=(3,))
    return out


def test_greedy_bundle_matches_live_decode(trained_for_export, greedy_bundle):
    cfg, tok, utts, solver = trained_for_export
    bundle = load_bundle(greedy_bundle)
    audios = [load_audio(u.audio, cfg.frontend.sample_rate)
              for u in utts[:2]]
    got = bundle.transcribe(audios)

    # live reference: the solver's own greedy decode on the same batch,
    # padded exactly like the bundle pads (same bucket shape)
    import jax.numpy as jnp

    from pytorch_end2end_speech_recognition_tpu.ops.ctc import (
        ctc_greedy_decode,
    )

    Ts = int(3 * cfg.frontend.sample_rate)
    batch = np.zeros((2, Ts), np.float32)
    lens = np.zeros((2,), np.int32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
        lens[i] = len(a)
    model = solver.merged_model()
    enc, enc_lens = model.encode(jnp.asarray(batch), jnp.asarray(lens),
                                 train=False)
    ids, id_lens = ctc_greedy_decode(model.ctc_logits(enc), enc_lens)
    want = [tok.decode(np.asarray(ids[i])[: int(id_lens[i])])
            for i in range(2)]
    assert got == want


@pytest.mark.slow  # hybrid fit + beam while-loop export compile ~90s
def test_beam_bundle_runs_and_decodes(trained_for_export, tmp_path):
    # the shared fixture is pure-CTC (no decoder); beam export needs the
    # hybrid model, so train a throwaway one briefly
    cfg, tok, utts, _ = trained_for_export
    import copy

    cfg = copy.deepcopy(cfg)
    cfg.model.ctc_weight = 0.3
    cfg.model.decoder_layers = 1
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt_beam")
    cfg.train.metrics_path = str(tmp_path / "mb.jsonl")
    solver = Solver(cfg, tok)
    solver.fit(BucketedLoader(utts, tok, cfg.data), steps=5)
    solver.save_checkpoint("best")
    out = export_bundle(cfg, tok, tmp_path / "bundle_beam",
                        checkpoint_tag="best", mode="beam",
                        batch_sizes=(2,), seconds=(3,))
    bundle = load_bundle(out)
    audios = [load_audio(u.audio, cfg.frontend.sample_rate)
              for u in utts[:2]]
    got = bundle.transcribe(audios)
    assert len(got) == 2 and all(isinstance(t, str) for t in got)


def test_bucket_selection_and_overflow(greedy_bundle):
    bundle = load_bundle(greedy_bundle)
    assert bundle._pick_bucket(1, int(1.5 * 16000)) == (2, 3)
    assert bundle._pick_bucket(2, int(3 * 16000)) == (2, 3)
    with pytest.raises(ValueError, match="no exported bucket"):
        bundle._pick_bucket(3, 16000)  # batch overflow
    with pytest.raises(ValueError, match="no exported bucket"):
        bundle._pick_bucket(1, int(10 * 16000))  # duration overflow


def test_vocab_hash_integrity(greedy_bundle, tmp_path):
    # corrupt a copy's tokenizer -> load must refuse
    import shutil

    out = tmp_path / "corrupt"
    shutil.copytree(greedy_bundle, out)
    other = CharTokenizer(charset="XYZQW")
    other.save(out / "tokenizer.json")
    with pytest.raises(ValueError, match="vocab_hash"):
        load_bundle(out)
