"""Data layer tests: audio I/O round-trip, tokenizers, manifests, bucketing."""

import numpy as np

from pytorch_end2end_speech_recognition_tpu.data.audio import (
    load_audio,
    read_wav,
    resample,
    write_wav,
)
from pytorch_end2end_speech_recognition_tpu.data.dataset import (
    BucketedLoader,
    prefetch,
)
from pytorch_end2end_speech_recognition_tpu.data.manifest import read_manifest
from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
    BLANK_ID,
    N_SPECIAL,
    BpeTokenizer,
    CharTokenizer,
    Tokenizer,
)
from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig, DataConfig


def test_wav_roundtrip(tmp_path, rng):
    x = (0.5 * np.sin(np.linspace(0, 100, 16000))).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(x, y, atol=1e-4)


def test_resample_length():
    x = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    y = resample(x, 8000, 16000)
    assert abs(len(y) - 16000) <= 2


def test_char_tokenizer_roundtrip(tmp_path):
    corpus = ["HELLO WORLD", "SPEECH RECOGNITION"]
    t = CharTokenizer(corpus)
    ids = t.encode("hello world")
    assert all(i >= N_SPECIAL for i in ids)
    assert t.decode(ids) == "HELLO WORLD"
    p = tmp_path / "tok.json"
    t.save(p)
    t2 = Tokenizer.load(p)
    assert t2.encode("hello world") == ids


def test_bpe_tokenizer_roundtrip(tmp_path):
    corpus = ["THE CAT SAT ON THE MAT"] * 10 + ["THE DOG RAN"] * 5
    t = BpeTokenizer(corpus, vocab_size=40)
    ids = t.encode("the cat ran")
    assert t.decode(ids) == "THE CAT RAN"
    p = tmp_path / "bpe.json"
    t.save(p)
    t2 = Tokenizer.load(p)
    assert t2.encode("the cat ran") == ids
    assert t2.decode(ids) == "THE CAT RAN"


def test_bucketed_loader_shapes(digits_corpus):
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])
    cfg = DataConfig(batch_size=4, n_length_buckets=3, batch_frames=10**9)
    loader = BucketedLoader(utts, tok, cfg)
    shape_set = set()
    n_utts = 0
    for b in loader:
        assert b.audio.dtype == np.float32
        assert b.tokens.dtype == np.int32
        assert b.audio.shape[0] == b.tokens.shape[0]
        # pad rows have zero length
        n_utts += int((b.audio_lens > 0).sum())
        # valid rows fit in padding
        assert (b.audio_lens <= b.audio.shape[1]).all()
        assert (b.token_lens <= b.tokens.shape[1]).all()
        # padding of tokens is blank
        for r in range(b.tokens.shape[0]):
            assert (b.tokens[r, b.token_lens[r]:] == BLANK_ID).all()
        shape_set.add(b.shape_key)
    assert n_utts == len(loader.utts)
    assert len(shape_set) <= len(loader.buckets)


def test_loader_sharding(digits_corpus):
    utts = read_manifest(digits_corpus["train"])
    tok = CharTokenizer([u.text for u in utts])
    cfg = DataConfig(batch_size=4, n_length_buckets=2, shuffle=False)
    ids = set()
    for shard in range(2):
        loader = BucketedLoader(utts, tok, cfg, shard_index=shard, num_shards=2)
        for b in loader:
            for i, uid in enumerate(b.ids):
                assert uid not in ids
                ids.add(uid)
    assert len(ids) == len(utts)


def test_prefetch_preserves_order():
    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))


def test_config_roundtrip_and_override():
    cfg = AsrConfig()
    cfg2 = AsrConfig.from_json(cfg.to_json())
    assert cfg2.to_dict() == cfg.to_dict()
    cfg2.override("model.encoder", "conformer")
    cfg2.override("train.lr", "0.01")
    cfg2.override("frontend.spec_augment", "false")
    assert cfg2.model.encoder == "conformer"
    assert cfg2.train.lr == 0.01
    assert cfg2.frontend.spec_augment is False


def test_compilation_cache_roundtrip(tmp_path):
    """enable_compilation_cache persists an executable that a second process
    (simulated by jax.clear_caches()) reloads: the re-trace after clearing
    must HIT the persistent cache, not recompile."""
    import jax
    import jax.numpy as jnp

    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
    )

    path = enable_compilation_cache(str(tmp_path / "xla_cache"))
    assert path
    # floor below any real compile so this tiny test graph is persisted too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # if an earlier test in this worker already initialized the cache
    # singleton at another dir, re-pointing the config alone is not enough
    # (--slow ordering flake): reset so the singleton rebinds to tmp_path
    try:
        from jax._src.compilation_cache import reset_cache

        reset_cache()
    except Exception:
        pass

    @jax.jit
    def f(x):
        return (x * 2.0 + 1.0).sum()

    assert float(f(jnp.arange(8.0))) == 64.0
    import os

    files = []
    for root, _, names in os.walk(path):
        files += [os.path.join(root, n) for n in names]
    assert files, "persistent compilation cache wrote no entries"

    # "second process": drop every in-memory executable, re-jit, and count
    # persistent-cache hits via jax's own counter.
    jax.clear_caches()
    from jax._src import monitoring

    events = []
    monitoring.register_event_listener(lambda e, **kw: events.append(e))

    @jax.jit
    def g(x):
        return (x * 2.0 + 1.0).sum()

    assert float(g(jnp.arange(8.0))) == 64.0
    assert "/jax/compilation_cache/cache_hits" in events, (
        f"re-trace after clear_caches did not hit the persistent cache "
        f"(events: {sorted(set(events))})"
    )


def test_tokenizer_load_for_config_fallbacks(tmp_path, digits_corpus):
    """decode/transcribe resolve the vocab even when data.tokenizer_path is
    unset: ckpt-dir copy first, then deterministic rebuild from the train
    manifest (r2: train->decode round-trip without explicit tokenizer_path)."""
    import pytest

    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        CharTokenizer,
        load_for_config,
    )

    manifests = digits_corpus
    utts = read_manifest(manifests["train"])
    cfg = AsrConfig()
    cfg.data.tokenizer_path = ""
    cfg.data.train_manifest = str(manifests["train"])
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")

    # 1) ckpt-dir copy wins when present
    (tmp_path / "ckpt").mkdir()
    ref = CharTokenizer([u.text for u in utts])
    ref.save(tmp_path / "ckpt" / "tokenizer.json")
    tok = load_for_config(cfg)
    assert tok.vocab == ref.vocab

    # 2) no ckpt copy -> rebuilt from the train manifest, identical vocab
    (tmp_path / "ckpt" / "tokenizer.json").unlink()
    tok2 = load_for_config(cfg)
    assert tok2.vocab == ref.vocab

    # 3) nothing resolvable -> clear error
    cfg.data.train_manifest = str(tmp_path / "missing.jsonl")
    with pytest.raises(FileNotFoundError):
        load_for_config(cfg)


def test_vocab_hash_guards_checkpoint_mismatch(tmp_path, digits_corpus):
    """Checkpoint meta carries a crc32 of the tokenizer vocab; restoring with
    a *different* same-sized vocab (e.g. rebuilt from a changed manifest)
    raises instead of silently producing garbage transcripts (ADVICE.md r2)."""
    import pytest

    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        CharTokenizer,
    )
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver

    cfg = AsrConfig()
    cfg.model.encoder = "blstm"
    cfg.model.encoder_layers = 1
    cfg.model.encoder_dim = 32
    cfg.model.ctc_weight = 1.0
    cfg.model.dtype = "float32"
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.metrics_path = str(tmp_path / "m.jsonl")

    tok_a = CharTokenizer(charset="ABC")
    tok_b = CharTokenizer(charset="ABD")  # same vocab_size, different vocab
    assert tok_a.vocab_size == tok_b.vocab_size
    assert tok_a.vocab_hash() != tok_b.vocab_hash()

    s = Solver(cfg, tok_a)
    s.save_checkpoint("last")
    ok = Solver(cfg, tok_a)
    ok.load_checkpoint("last")  # same vocab: fine
    bad = Solver(cfg, tok_b)
    with pytest.raises(ValueError, match="tokenizer/checkpoint mismatch"):
        bad.load_checkpoint("last")


def test_phrases_corpus_grammar(tmp_path):
    """Grammar corpus for the LM-fusion evidence run: AREA(3) DASH LINE(4),
    area codes from the closed set (data/synthetic.make_phrases_corpus)."""
    import numpy as np

    from pytorch_end2end_speech_recognition_tpu.data.audio import load_audio
    from pytorch_end2end_speech_recognition_tpu.data.synthetic import (
        AREA_CODES,
        WORDS,
        make_phrases_corpus,
        sample_phrase,
    )

    rng = np.random.default_rng(1)
    areas = {tuple(sample_phrase(rng)[:3]) for _ in range(40)}
    assert areas <= set(AREA_CODES) and len(areas) > 1
    m = make_phrases_corpus(tmp_path, n_train=3, n_dev=1, n_test=1)
    utts = read_manifest(m["train"])
    for u in utts:
        words = u.text.split()
        assert len(words) == 8 and words[3] == "DASH"
        assert all(w in WORDS for w in words)
        a = load_audio(u.audio, 16000)
        assert len(a) > 16000 and np.abs(a).max() > 0.05
