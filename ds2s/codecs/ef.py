"""Elias-Fano encodings of monotone integer sequences.

Fresh numpy implementation of the *semantics* of the reference's
compact/strict Elias-Fano ([U] ds2i/compact_elias_fano.hpp,
[U] ds2i/strict_elias_fano.hpp — upstream layout, SURVEY.md §2.2):

- values v_0 ≤ … ≤ v_{n-1} < universe u;
- low ``l = max(0, floor(log2(u/n)))`` bits of each value bit-packed;
- high bits as a unary bitvector: bit ``(v_i >> l) + i`` set.

The bitstream is our own (self-describing header; the reference's exact
bits are not a requirement — round-trip exactness is).  Decode is whole-
sequence vectorized; ``next_geq`` at serve time is np.searchsorted over
the decoded array (SURVEY.md §2.2 note on select-free decoding).
"""

from __future__ import annotations

import numpy as np

from .bitio import (
    get_u32,
    get_u64,
    pack_bits,
    pack_unary_positions,
    put_u32,
    put_u64,
    unpack_bits,
    unpack_one_positions,
)


def ef_low_bits(universe: int, n: int) -> int:
    if n == 0 or universe <= n:
        return 0
    return max(0, int(universe // n).bit_length() - 1)


def ef_bit_cost(universe: int, n: int) -> int:
    """Exact payload bit cost (used by indexed_sequence's cost model,
    [U] ds2i/indexed_sequence.hpp best_type)."""
    if n == 0:
        return 0
    l = ef_low_bits(universe, n)
    high_len = n + (universe >> l) + 1
    return n * l + high_len


def ef_encode(values: np.ndarray, universe: int) -> bytes:
    """Monotone (non-decreasing) values in [0, universe)."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    l = ef_low_bits(universe, n)
    header = put_u32(n) + put_u64(universe) + bytes([l])
    if n == 0:
        return header
    lows = pack_bits(v & ((np.uint64(1) << np.uint64(l)) - np.uint64(1)), l) if l else b""
    high = (v >> np.uint64(l)).astype(np.int64) + np.arange(n, dtype=np.int64)
    high_len = n + (int(universe) >> l) + 1
    highs = pack_unary_positions(high, high_len)
    return header + lows + highs


def ef_decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int, int]:
    """→ (values, universe, next_offset)."""
    n, off = get_u32(buf, offset)
    universe, off = get_u64(buf, off)
    l = buf[off]
    off += 1
    if n == 0:
        return np.zeros(0, dtype=np.uint64), universe, off
    low_bytes = (n * l + 7) // 8
    lows = unpack_bits(buf[off : off + low_bytes], n, l) if l else np.zeros(n, np.uint64)
    off += low_bytes
    high_len = n + (universe >> l) + 1
    high_bytes = (high_len + 7) // 8
    ones = unpack_one_positions(buf[off : off + high_bytes], high_len)
    off += high_bytes
    high = (ones - np.arange(n, dtype=np.int64)).astype(np.uint64)
    return (high << np.uint64(l)) | lows, universe, off


def sef_encode(values: np.ndarray, universe: int) -> bytes:
    """Strict EF for STRICTLY increasing values: encode v_i - i
    (universe shrinks by n-1) — [U] ds2i/strict_elias_fano.hpp."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    shifted = v - np.arange(n, dtype=np.uint64)
    return ef_encode(shifted, max(int(universe) - n + 1, 1))


def sef_decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    vals, _, off = ef_decode(buf, offset)
    return vals + np.arange(len(vals), dtype=np.uint64), off


def positive_encode(values: np.ndarray) -> bytes:
    """Positive sequence (tf lists, all ≥ 1): prefix-sum → strictly
    increasing → strict EF ([U] ds2i/positive_sequence.hpp)."""
    v = np.asarray(values, dtype=np.uint64)
    csum = np.cumsum(v, dtype=np.uint64)
    universe = int(csum[-1]) + 1 if len(csum) else 1
    return sef_encode(csum, universe)


def positive_decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    csum, off = sef_decode(buf, offset)
    return np.diff(csum, prepend=np.uint64(0)).astype(np.uint64), off
