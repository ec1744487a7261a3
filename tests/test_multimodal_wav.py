"""Real WAV decode path (round-4 verdict item 4): the multimodal decode
step was a declared stub for every binary format; wav is now a genuine
RIFF/WAVE container parse via the stdlib ``wave`` module.

The construction keeps it oracle-checkable: PCM16 sample = (byte-128)<<8,
inverted exactly by (sample>>8)+128, so feature extractors over the
decoded wav must equal the same extractors over the raw text bytes — and
the wav driver queries share the txt DuckDB oracles.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from compare_util import assert_match, duck_run

from ds2s import multimodal as M
from ds2s import oracle_text as OT

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def test_wav_round_trip_golden():
    """encode → decode reproduces the source bytes bit-for-bit, across the
    full byte domain and edge cases (empty, single byte, 0x00, 0xff)."""
    for raw in (
        bytes(range(256)),
        b"",
        b"\x00",
        b"\xff",
        b"hello world",
        bytes([0, 255, 128, 127, 1, 254] * 100),
    ):
        wav = M.wav_bytes(raw)
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        got = M.decode_media(wav, "wav")
        assert got.dtype == np.uint8
        assert got.tobytes() == raw


def test_wav_container_is_real():
    """The payload is a complete, independently-parseable WAV file with
    the declared sample layout — not a bespoke framing."""
    wav = M.wav_bytes(b"abc", framerate=8000)
    with wave.open(io.BytesIO(wav), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == 3
        pcm = np.frombuffer(w.readframes(3), dtype="<i2")
    assert pcm.tolist() == [(b - 128) << 8 for b in b"abc"]


def test_wav_decode_rejects_unsupported_layout():
    """Stereo / non-16-bit payloads must fail loudly, not silently
    mis-decode; unknown binary formats keep the declared stub."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="16-bit mono"):
        M.decode_media(buf.getvalue(), "wav")
    with pytest.raises(NotImplementedError):
        M.decode_media(b"\xff\xd8\xff", "jpeg")


def test_resize_media_wav_equals_txt_path(docs):
    """The same pooling over the decoded wav must equal the txt
    passthrough — the decode is lossless by construction."""
    txt = {
        (r["doc_id"], r["pos"]): r["value"]
        for r in M.resize_media(M.media_table(docs)).collect()
    }
    wav = {
        (r["doc_id"], r["pos"]): r["value"]
        for r in M.resize_media(M.wav_media_table(docs)).collect()
    }
    assert wav == txt


def test_wav_oracle_parity(docs):
    assert_match(
        M.resize_media(M.wav_media_table(docs)),
        duck_run(OT.sql_resize_media(), SF),
        "resize_media_wav",
    )
    assert_match(
        M.byte_histogram(M.wav_media_table(docs)),
        duck_run(OT.sql_byte_histogram(), SF),
        "byte_histogram_wav",
    )


def test_frame_sample_over_wav_slices_container(docs):
    """frame_sample plumbing over real wav payloads: slices are exact
    byte ranges of the container (deterministic stand-in contract)."""
    sample = docs.limit(5)
    rows = M.frame_sample(M.wav_media_table(sample), n_frames=4).collect()
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, frames in by_doc.items():
        raw = M.wav_bytes(texts[doc_id].encode("utf-8"))
        step = max(1, len(raw) // 4)
        for fr in sorted(frames, key=lambda r: r["frame_id"]):
            i = fr["frame_id"]
            assert bytes(fr["frame"]) == raw[i * step : i * step + step]
