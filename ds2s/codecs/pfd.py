"""OptPFD-style block codec (patched frame-of-reference, optimal bit width).

Semantics per the reference's block codec family ([U] ds2i/block_codecs.hpp
wrapping FastPFor's OPTPFor — upstream layout, SURVEY.md §2.2): values are
split into ≤128-int blocks; each block picks the bit width ``b`` minimizing
``128·b + exception_cost``; values not fitting ``b`` bits store their low
``b`` bits in the frame and their remainder as patches.  Per
BASELINE.json:6 this is "OptPFD-style": the bitstream is our own; decoded
values must round-trip exactly.

Cost search is fully vectorized over all 33 candidate widths at once
(bit-length histogram + per-candidate exception byte costs).
"""

from __future__ import annotations

import numpy as np

from .bitio import (
    bit_length,
    pack_bits,
    put_u32,
    unpack_bits,
    varint_decode,
    varint_encode,
)

BLOCK = 128


def _choose_width(v: np.ndarray, bl: np.ndarray | None = None) -> int:
    """argmin_b of frame bits + exception bytes (positions + varint highs).

    Fully vectorized over all candidate widths (n×34 matrix) — this runs
    once per 128-posting block on the build hot path.  ``bl`` (per-value
    bit lengths) may be passed in to avoid recomputation."""
    if len(v) == 0:
        return 0
    if bl is None:
        bl = bit_length(v).astype(np.int64)
    max_bl = int(bl.max())
    n = len(v)
    B = np.arange(max_bl + 1, dtype=np.int64)
    D = bl[:, None] - B[None, :]  # high bits per (value, candidate)
    exc = D > 0
    vbytes = np.maximum((D + 6) // 7, 1)  # varint bytes of the high part
    exc_bytes = np.where(exc, vbytes + 1, 0).sum(axis=0)  # +1 = position byte
    cost = n * B + 8 * exc_bytes + 16
    # exceptions-per-block are stored in a u8 count: keep ≤ 255 (n ≤ 128
    # guarantees it), tie-break toward the LOWEST cost then highest b is
    # unnecessary — argmin picks the first (lowest b), matching the scalar
    # loop's strict '<' update order
    return int(B[np.argmin(cost)])


def pfd_encode_block(values: np.ndarray) -> bytes:
    """One block (len ≤ 128) of non-negative uint64 values."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        # the header stores n-1 in a u8, so an empty block is
        # UNREPRESENTABLE — encoding it would alias to a 1-value block
        # that decodes to [0] (round-5 review finding)
        raise ValueError("pfd_encode_block: empty block is unrepresentable")
    bl = bit_length(v).astype(np.int64)
    b = _choose_width(v, bl)
    if b >= 64:
        # 1<<64 is numpy-undefined (platform-dependent wraparound +
        # RuntimeWarning); the all-ones mask must be spelled directly
        mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    else:
        mask = (np.uint64(1) << np.uint64(b)) - np.uint64(1) if b else np.uint64(0)
    lows = pack_bits(v & mask, b) if b else b""
    exc_pos = np.flatnonzero(bl > b)
    highs = (v[exc_pos] >> np.uint64(b)) if len(exc_pos) else np.zeros(0, np.uint64)
    out = bytes([n - 1, b, len(exc_pos)])
    out += lows
    out += exc_pos.astype(np.uint8).tobytes()
    out += varint_encode(highs)
    return out


def pfd_decode_block(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    n = buf[offset] + 1
    b = buf[offset + 1]
    n_exc = buf[offset + 2]
    off = offset + 3
    low_bytes = (n * b + 7) // 8
    v = unpack_bits(buf[off : off + low_bytes], n, b) if b else np.zeros(n, np.uint64)
    off += low_bytes
    if n_exc:
        pos = np.frombuffer(buf[off : off + n_exc], dtype=np.uint8).astype(np.int64)
        off += n_exc
        # varint payload length: scan n_exc terminators.  A uint64 varint
        # is ≤ 10 bytes, so the scan window is exactly bounded — scanning
        # to the buffer end made multi-block decode O(blocks × remaining)
        # on exception-heavy lists (round-5 review finding)
        payload = np.frombuffer(
            buf, dtype=np.uint8, offset=off,
            count=min(n_exc * 10, len(buf) - off),
        )
        ends = np.flatnonzero((payload & 0x80) == 0)[:n_exc]
        used = int(ends[-1]) + 1
        highs = varint_decode(buf[off : off + used], n_exc)
        off += used
        v[pos] |= highs << np.uint64(b)
    return v, off


def pfd_encode(values: np.ndarray) -> bytes:
    """Multi-block framing: u32 count, then 128-value blocks."""
    v = np.asarray(values, dtype=np.uint64)
    out = bytearray(put_u32(len(v)))
    for s in range(0, len(v), BLOCK):
        out += pfd_encode_block(v[s : s + BLOCK])
    return bytes(out)


def pfd_decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    n = int.from_bytes(buf[offset : offset + 4], "little")
    off = offset + 4
    chunks = []
    got = 0
    while got < n:
        c, off = pfd_decode_block(buf, off)
        chunks.append(c)
        got += len(c)
    return (np.concatenate(chunks) if chunks else np.zeros(0, np.uint64)), off
