"""Multimodal column plumbing: opaque binary media + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns with typed metadata and runs decode / feature-extract
as Arrow-batched UDFs.  Two container formats decode for REAL with the
stdlib alone — ``wav`` (RIFF/WAVE, 16-bit mono PCM via ``wave``) and
``png`` (8-bit grayscale: chunk walk + CRC32 + zlib inflate + vectorized
scanline unfiltering, implemented here) — while jpeg/mp4, whose decoders
need codec libraries absent from this sandbox, stay a clearly-marked loud
stub.  Everything Spark-side — schema, batching, partitioning, UDF
signatures — is real and tested on every path.

``byte_histogram`` is a REAL feature extractor (bucketed byte histogram of
the payload, numpy over Arrow batches) with an exact DuckDB oracle on the
ASCII corpus (codepoints == bytes, verified in FIXTURES.md).

Scale: narrow per-row transforms; media payloads never hit the driver;
batch size is bounded by Arrow's maxRecordsPerBatch so a partition of
large blobs streams through the Python worker.

SIZING INVARIANT (round-3 advice): ds2s.session disables Spark 4's
per-row BYTE-based Arrow batch sizing (the Int.MaxValue sentinel on
spark.sql.execution.arrow.maxBytesPerBatch — see session.py for why), so
batches here are bounded ONLY by maxRecordsPerBatch (default 10k rows).
The sandbox media payloads are ≤ ~2 KB/row; a production pipeline pushing
multi-MB blobs through these stages MUST lower
spark.sql.execution.arrow.maxRecordsPerBatch (e.g. to 64) — 10k × 5 MB
rows would build a 50 GB batch and trip Arrow's 2 GB buffer limits.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import round_half_up

N_BUCKETS = 16

# formats decode_media can actually decode (it raises on anything else):
# txt = raw utf-8 bytes; wav = REAL RIFF/WAVE container, 16-bit mono PCM
# via the stdlib wave module; png = REAL PNG container, 8-bit grayscale,
# parsed and unfiltered here over stdlib zlib (signature + chunk walk +
# CRC32 verification + inflate + scanline filter reversal — no codec
# library needed).  jpeg/mp4 remain the declared loud stub.
SUPPORTED_FORMATS = ("txt", "wav", "png")

WAV_FRAMERATE = 16000


def media_table(documents: DataFrame, fmt: str = "txt") -> DataFrame:
    """documents → (doc_id, media binary, meta struct<format,n_bytes>).

    In production this is the Iceberg media table (binary column + typed
    metadata); here the payload is the utf-8 document text."""
    media = F.encode("text", "utf-8")
    return documents.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length("text").alias("n_bytes"),
        ).alias("meta"),
    )


def _pcm16_from_bytes(raw: bytes) -> bytes:
    """utf-8 bytes → 16-bit mono PCM frames: byte b becomes sample
    ``(b - 128) << 8`` (int16 LE).  The mapping is exactly inverted by
    ``(sample >> 8) + 128``, so a decoded wav payload reproduces the
    source bytes bit-for-bit — which lets the wav variants of
    resize_media / byte_histogram share the txt operators' DuckDB oracles
    (the oracle recomputes from ``text``; the engine round-trips through
    a real audio container)."""
    arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
    return (((arr - 128) << 8).astype("<i2")).tobytes()


def wav_bytes(raw: bytes, framerate: int = WAV_FRAMERATE) -> bytes:
    """One payload → a complete RIFF/WAVE file (stdlib ``wave`` writer):
    16-bit mono PCM whose samples derive from the payload bytes
    (``_pcm16_from_bytes``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(_pcm16_from_bytes(raw))
    return buf.getvalue()


def wav_media_table(documents: DataFrame,
                    framerate: int = WAV_FRAMERATE) -> DataFrame:
    """documents → (doc_id, media, meta) where ``media`` is a REAL WAV
    file (RIFF header + fmt/data chunks + 16-bit mono PCM) built from the
    document bytes — the audio-modality stand-in whose *decode* step is a
    genuine container parse, not a passthrough.  Same schema contract as
    ``media_table``; narrow mapInPandas (payloads never hit the driver)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                wav_bytes(t.encode("utf-8"), framerate) for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": payloads,
                    "meta": [
                        {"format": "wav", "n_bytes": len(p)} for p in payloads
                    ],
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        build,
        schema="doc_id long, media binary, "
        "meta struct<format:string, n_bytes:long>",
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_bytes(raw: bytes) -> bytes:
    """One payload (n ≥ 1 bytes) → a complete, spec-valid PNG file:
    8-bit grayscale, one ``n``×1 scanline, filter type 1 (Sub), zlib IDAT,
    CRC32 on every chunk.  Sub-filtering is the vectorized byte delta
    (``np.diff`` with uint8 wraparound), so encode stays O(n) numpy — no
    per-pixel Python.  The image decodes back to exactly ``raw`` (the
    Sub reversal is a cumsum mod 256), which lets the png variants of
    byte_histogram / resize_media share the txt operators' DuckDB oracles
    the same way the wav path does."""
    import struct
    import zlib

    n = len(raw)
    if n == 0:
        # PNG forbids 0-dimension images (IHDR width/height ≥ 1); callers
        # (png_media_table) drop empty payloads instead — downstream
        # operators emit no rows for empty payloads either way
        raise ValueError("png_bytes: empty payload has no PNG representation")
    arr = np.frombuffer(raw, dtype=np.uint8)
    filt = np.diff(arr, prepend=np.uint8(0))  # uint8 wraparound == mod 256
    scanline = b"\x01" + filt.tobytes()
    ihdr = struct.pack(">IIBBBBB", n, 1, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanline))
        + _png_chunk(b"IEND", b"")
    )


def _png_decode(data: bytes) -> np.ndarray:
    """REAL PNG decode over stdlib zlib: validate the signature, walk the
    chunk stream verifying each CRC32, parse IHDR (8-bit grayscale,
    non-interlaced only — the subset this pipeline writes), concatenate
    IDAT segments, inflate, and reverse per-scanline filters.

    Filters 0 (None), 1 (Sub) and 2 (Up) are supported; Sub reversal is a
    vectorized cumsum mod 256 and Up reversal a vectorized add to the
    prior reconstructed row, so decode is O(pixels) numpy with a Python
    loop only over scanlines (our tables write height=1).  Anything the
    subset excludes — palette/color types, bit depths ≠ 8, interlace,
    filters 3/4 — raises rather than silently mis-decodes."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("png: bad signature")
    pos = 8
    width = height = None
    idat = bytearray()
    seen_iend = False
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("png: truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color != 0 or comp != 0 or filt != 0 or inter != 0:
                raise ValueError(
                    "png: only 8-bit non-interlaced grayscale is supported "
                    f"(depth={depth} color={color} interlace={inter})"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if width is None or not seen_iend:
        raise ValueError("png: missing IHDR or IEND")
    rows = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if rows.size != height * (width + 1):
        raise ValueError("png: IDAT size does not match dimensions")
    rows = rows.reshape(height, width + 1)
    ftype, filt_rows = rows[:, 0], rows[:, 1:]
    out = np.empty((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for r in range(height):
        t = int(ftype[r])
        if t == 0:
            rec = filt_rows[r]
        elif t == 1:  # Sub: recon[i] = filt[i] + recon[i-1] (bpp=1)
            rec = (
                np.cumsum(filt_rows[r].astype(np.int64)) % 256
            ).astype(np.uint8)
        elif t == 2:  # Up: recon[i] = filt[i] + prior_row[i]
            rec = filt_rows[r] + prev  # uint8 wraparound == mod 256
        else:
            raise ValueError(f"png: filter type {t} not supported")
        out[r] = rec
        prev = rec
    return out.reshape(-1)


def png_media_table(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, media, meta) where ``media`` is a REAL PNG
    file (8-bit grayscale ``n``×1, Sub-filtered, zlib-compressed, CRC'd)
    built from the document bytes — the image-modality stand-in whose
    decode step is a genuine container parse + unfilter, not a
    passthrough.  Same schema contract as ``media_table``; narrow
    mapInPandas, payloads never hit the driver.

    Empty documents are dropped (PNG forbids 0-dimension images); the
    downstream operators emit no rows for empty payloads on any path, so
    outputs — and the shared txt oracles — are unchanged by the drop."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [png_bytes(t.encode("utf-8")) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": payloads,
                    "meta": [
                        {"format": "png", "n_bytes": len(p)} for p in payloads
                    ],
                }
            )

    return (
        documents.filter(F.octet_length("text") > 0)
        .select("doc_id", "text")
        .mapInPandas(
            build,
            schema="doc_id long, media binary, "
            "meta struct<format:string, n_bytes:long>",
        )
    )


def decode_media(media: bytes, fmt: str) -> np.ndarray:
    """Decode one payload to a uint8 sample array.

    - ``txt``: raw utf-8 bytes (passthrough).
    - ``wav``: REAL decode — stdlib ``wave`` parses the RIFF container
      (validating 16-bit mono PCM), and samples map back to unsigned
      8-bit via ``(sample >> 8) + 128`` so downstream feature extractors
      (histogram, resize) see one uniform value domain per modality.
    - ``png``: REAL decode — ``_png_decode`` walks the chunk stream
      (CRC32-verified), inflates the IDAT with stdlib zlib, and reverses
      the scanline filters (vectorized Sub/Up), yielding the grayscale
      pixels row-major.
    - jpeg/mp4: still the declared loud stub — those decoders need codec
      libraries absent from this container; raise rather than silently
      fake."""
    if fmt == "txt":
        return np.frombuffer(media, dtype=np.uint8)
    if fmt == "png":
        return _png_decode(bytes(media))
    if fmt == "wav":
        import io
        import wave

        with wave.open(io.BytesIO(bytes(media)), "rb") as w:
            if w.getsampwidth() != 2 or w.getnchannels() != 1:
                raise ValueError(
                    "decode_media(wav): expected 16-bit mono PCM, got "
                    f"width={w.getsampwidth()} channels={w.getnchannels()}"
                )
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        return ((pcm >> 8) + 128).astype(np.uint8)
    raise NotImplementedError(
        f"decode for format {fmt!r} requires codec libraries not available "
        f"in this environment (supported: {SUPPORTED_FORMATS}; plumbing is "
        "real — wire a decoder here)"
    )


def byte_histogram(media: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, bucket, cnt, frac) — bucketed byte histogram per payload.

    Long-form rows (not a fixed-width array) so the result is engine-
    comparable; empty payloads emit no rows."""
    if not (1 <= n_buckets <= 256) or 256 % n_buckets:
        # 256 % n_buckets != 0 would emit a bucket index == n_buckets for
        # high bytes, and n_buckets > 256 would floor-divide by zero and
        # silently collapse every byte into bucket 0 (round-5 review
        # finding) — declared semantics: power-of-two-style even buckets.
        raise ValueError(
            f"byte_histogram: n_buckets must divide 256 (got {n_buckets})"
        )
    width = 256 // n_buckets

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "bucket": [], "cnt": [], "frac": []}
            for doc_id, media_bytes, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["meta"]
            ):
                arr = decode_media(bytes(media_bytes), meta["format"])
                if len(arr) == 0:
                    continue
                counts = np.bincount(arr // width, minlength=n_buckets)
                nz = np.flatnonzero(counts)
                out["doc_id"].extend([doc_id] * len(nz))
                out["bucket"].extend(nz.tolist())
                out["cnt"].extend(counts[nz].tolist())
                out["frac"].extend(
                    round_half_up(counts[nz] / len(arr), 6).tolist()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(hist, schema="doc_id long, bucket int, cnt long, frac double")


def resize_media(media: DataFrame, target_len: int = 64) -> DataFrame:
    """(doc_id, pos, value) — average-pool each decoded payload to a fixed
    length (the 1-D analogue of image resize; the brief's *resize* verb).

    Pooling rule (frozen so the DuckDB oracle can reproduce it exactly):
    sample j of an n-sample payload lands in bucket ``j * target_len // n``;
    a bucket's value is the mean of its samples, rounded half-up to 6 dp.
    Payloads shorter than ``target_len`` emit only their non-empty buckets
    (long-form rows, like ``byte_histogram``).  Sums stay < 2**53 so the
    float64 mean is exact-before-rounding on both engines.

    Scale: narrow per-row numpy over Arrow batches; a real 2-D image
    resize swaps ``decode_media`` and pools per axis with the same rule —
    the Spark-side plumbing (schema, batching, partition shape) is what
    this operator pins down."""

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "pos": [], "value": []}
            for doc_id, media_bytes, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["meta"]
            ):
                arr = decode_media(bytes(media_bytes), meta["format"])
                n = len(arr)
                if n == 0:
                    continue
                idx = (np.arange(n, dtype=np.int64) * target_len) // n
                sums = np.bincount(idx, weights=arr, minlength=target_len)
                cnts = np.bincount(idx, minlength=target_len)
                nz = np.flatnonzero(cnts)
                out["doc_id"].extend([doc_id] * len(nz))
                out["pos"].extend(nz.tolist())
                out["value"].extend(
                    round_half_up(sums[nz] / cnts[nz], 6).tolist()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(pool, schema="doc_id long, pos int, value double")


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, frame_id, frame binary) — stride-packed payload slices:
    frame i is bytes [i*step, (i+1)*step) with step = len//n_frames, so
    frames are contiguous from the front and the trailing len % step bytes
    are not covered (a prefix sample, not an evenly-SPREAD one — declared
    semantics shared with the pytest golden slices).

    The video-frame-sampling plumbing (schema + batch shape) with a
    deterministic byte-slice stand-in for a real frame extractor."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_id": [], "frame": []}
            for doc_id, media_bytes in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(media_bytes)
                if not raw:
                    continue
                step = max(1, len(raw) // n_frames)
                for i in range(min(n_frames, len(raw))):
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(i)
                    out["frame"].append(raw[i * step : i * step + step])
            yield pd.DataFrame(out)

    return media.select("doc_id", "media").mapInPandas(
        sample, schema="doc_id long, frame_id int, frame binary"
    )
