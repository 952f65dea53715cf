"""WER/CER scorer tests."""

from pytorch_end2end_speech_recognition_tpu.metrics.wer import (
    ErrorStats,
    cer,
    edit_distance,
    wer,
)


def test_edit_distance_basic():
    assert edit_distance([], []) == 0
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance(list("abc"), list("abd")) == 1
    assert edit_distance(list("abc"), list("ab")) == 1
    assert edit_distance(list("abc"), list("xabc")) == 1
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance(list("sunday"), list("saturday")) == 3
    assert edit_distance([], list("abc")) == 3


def test_edit_distance_matches_bruteforce():
    import itertools
    import numpy as np

    def brute(a, b):
        n, m = len(a), len(b)
        D = np.zeros((n + 1, m + 1), int)
        D[:, 0] = np.arange(n + 1)
        D[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i, j] = min(
                    D[i - 1, j] + 1,
                    D[i, j - 1] + 1,
                    D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        return D[n, m]

    rng = np.random.default_rng(0)
    for _ in range(30):
        a = rng.integers(0, 4, rng.integers(0, 8)).tolist()
        b = rng.integers(0, 4, rng.integers(0, 8)).tolist()
        assert edit_distance(a, b) == brute(a, b), (a, b)


def test_wer_cer():
    refs = ["the cat sat", "hello world"]
    hyps = ["the cat sat", "hello word"]
    assert wer(refs, refs) == 0.0
    assert abs(wer(refs, hyps) - 1 / 5) < 1e-9
    assert cer(["abc"], ["abd"]) == 1 / 3


def test_error_stats():
    s = ErrorStats()
    s.update(["a", "b"], ["a", "b"])
    s.update(["a", "b"], ["a", "c"])
    assert s.tokens == 4 and s.errors == 1
    assert s.ser == 0.5
