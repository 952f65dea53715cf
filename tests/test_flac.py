"""FLAC codec tests: round-trip exactness, a hand-assembled golden stream,
STREAMINFO metadata, C++/Python decoder equivalence, loader integration,
and corruption detection (SURVEY.md §2a "Audio I/O"; VERDICT r1 item 5)."""

import struct

import numpy as np
import pytest

from pytorch_end2end_speech_recognition_tpu.data.flac import (
    crc8,
    crc16,
    flac_info,
    read_flac,
    write_flac,
)


def _signals():
    rng = np.random.default_rng(7)
    t = np.arange(20000) / 16000.0
    return [
        ("tone", np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5, "fixed"),
        ("noise", (rng.standard_normal(4097) * 0.2).astype(np.float32), "fixed"),
        ("loud", rng.standard_normal(3000).astype(np.float32), "fixed"),
        ("speechish", (np.sin(2 * np.pi * 150 * t[:9000]) * 0.4
                       + rng.standard_normal(9000) * 0.01).astype(np.float32),
         "lpc"),
        ("const", np.full(5000, 0.25, np.float32), "fixed"),
        ("tiny", np.array([0.1, -0.2, 0.3], np.float32), "fixed"),
        ("silence", np.zeros(4096, np.float32), "fixed"),
    ]


def test_crc_check_values():
    """CRC impls vs published check values (CRC-8/SMBUS, CRC-16/UMTS) —
    independent of our own encoder/decoder."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("name,x,pred", _signals())
def test_roundtrip_bit_exact(tmp_path, name, x, pred):
    p = tmp_path / f"{name}.flac"
    write_flac(p, x, 16000, predictor=pred)
    y, sr = read_flac(p, check_crc=True, verify_md5=True)
    assert sr == 16000
    ref = (np.clip(x, -1, 1) * 32767.0).astype(np.int64)
    got = np.round(y * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(got, ref)


def test_streaminfo_exact_duration(tmp_path):
    x = np.zeros(12345, np.float32)
    p = tmp_path / "d.flac"
    write_flac(p, x, 16000)
    info = flac_info(p)
    assert info.total_samples == 12345
    assert info.sample_rate == 16000
    assert info.bits_per_sample == 16
    assert info.channels == 1
    assert abs(info.duration_s - 12345 / 16000) < 1e-12


def test_golden_hand_assembled_stream(tmp_path):
    """A minimal FLAC assembled byte-by-byte from the format spec (not via
    our BitWriter): 4 samples of the constant value 1000, 16 kHz mono 16-bit.
    Layout per RFC 9639: fLaC magic; STREAMINFO (type 0, 34 bytes);
    one frame [sync 0x3FFE, fixed blocksize, bs_code=6 (8-bit n-1 follows),
    sr_code=5 (16 kHz), mono, 16 bps, frame#0, blocksize-1=3, CRC-8] with
    one CONSTANT subframe (type 0) holding 0x03E8, then frame CRC-16."""
    streaminfo = (
        b"\x00\x04"          # min blocksize 4
        b"\x00\x04"          # max blocksize 4
        b"\x00\x00\x00"      # min frame size (unknown)
        b"\x00\x00\x00"      # max frame size
        # sr=16000 (20b) | ch-1=0 (3b) | bps-1=15 (5b) | total=4 (36b):
        # 00000011 11101000 0000|000|0 1111|0000 -> 03 E8 00 F0, then 4
        b"\x03\xe8\x00\xf0"
        b"\x00\x00\x00\x04"
        + b"\x00" * 16       # md5 unset
    )
    hdr = bytes([0xFF, 0xF8, 0x65, 0x08, 0x00, 0x03])
    assert crc8(hdr) == 0xFC
    subframe = bytes([0x00, 0x03, 0xE8])  # type CONSTANT, value 1000
    body = hdr + bytes([0xFC]) + subframe
    frame = body + struct.pack(">H", crc16(body))
    data = b"fLaC" + bytes([0x80, 0, 0, 34]) + streaminfo + frame
    p = tmp_path / "golden.flac"
    p.write_bytes(data)

    y, sr = read_flac(p, check_crc=True)
    assert sr == 16000
    np.testing.assert_allclose(y, np.full(4, 1000 / 32768.0, np.float32))
    info = flac_info(p)
    assert info.total_samples == 4


def test_corruption_detected(tmp_path):
    x = np.sin(np.arange(8000) * 0.01).astype(np.float32) * 0.5
    p = tmp_path / "c.flac"
    write_flac(p, x, 16000)
    raw = bytearray(p.read_bytes())
    raw[len(raw) // 2] ^= 0x40  # flip a bit mid-stream
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError):
        read_flac(p, check_crc=True, verify_md5=True)


def test_not_flac_raises(tmp_path):
    p = tmp_path / "x.flac"
    p.write_bytes(b"RIFFxxxxWAVE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        read_flac(p)


def test_native_decoder_matches_python(tmp_path):
    from pytorch_end2end_speech_recognition_tpu.native import (
        get_lib,
        read_audio_native,
        read_flac_native,
    )

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    for name, x, pred in _signals():
        p = tmp_path / f"{name}.flac"
        write_flac(p, x, 16000, predictor=pred)
        py, _ = read_flac(p)
        cc, sr = read_flac_native(str(p), max_samples=len(x) + 8)
        assert sr == 16000
        np.testing.assert_array_equal(cc, py)
        # container sniff entry point too
        cc2, _ = read_audio_native(str(p), max_samples=len(x) + 8)
        np.testing.assert_array_equal(cc2, py)


def test_load_audio_dispatches_flac(tmp_path):
    from pytorch_end2end_speech_recognition_tpu.data.audio import load_audio

    x = np.sin(np.arange(16000) * 0.02).astype(np.float32) * 0.3
    p = tmp_path / "a.flac"
    write_flac(p, x, 16000)
    y = load_audio(p, target_sr=16000)
    ref = (np.clip(x, -1, 1) * 32767).astype(np.int64).astype(np.float32) / 32768.0
    np.testing.assert_allclose(y, ref, atol=1e-7)


def test_bucketed_loader_on_flac_corpus(tmp_path):
    """End-to-end: a manifest of FLAC files flows through BucketedLoader
    (native batch path sniffs containers; Python fallback otherwise)."""
    from pytorch_end2end_speech_recognition_tpu.data.dataset import (
        BucketedLoader,
    )
    from pytorch_end2end_speech_recognition_tpu.data.manifest import (
        Utterance,
        read_manifest,
        write_manifest,
    )
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        CharTokenizer,
    )
    from pytorch_end2end_speech_recognition_tpu.utils.config import DataConfig

    rng = np.random.default_rng(3)
    utts = []
    for i in range(6):
        n = 4000 + 700 * i
        x = (np.sin(np.arange(n) * (0.01 + 0.001 * i))
             * 0.4).astype(np.float32)
        p = tmp_path / f"u{i}.flac"
        write_flac(p, x, 16000)
        utts.append(Utterance(id=f"u{i}", audio=str(p),
                              duration_s=n / 16000, text="ONE TWO"))
    man = tmp_path / "m.jsonl"
    write_manifest(man, utts)
    cfg = DataConfig(batch_size=3, n_length_buckets=2, min_audio_s=0.01)
    loader = BucketedLoader(read_manifest(man), CharTokenizer(["ONE TWO"]),
                            cfg)
    seen = 0
    for b in loader.epoch(0):
        valid = b.audio_lens > 0
        seen += int(valid.sum())
        # decoded rows must carry real (nonzero) audio
        assert all(np.abs(b.audio[i]).max() > 0
                   for i in range(len(b.ids)) if b.audio_lens[i] > 0)
    assert seen == 6
