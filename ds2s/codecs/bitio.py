"""Vectorized bit-level primitives shared by every codec.

All kernels are pure numpy (no per-element Python): fixed-width bit packing
via bit-matrix packbits, unary bitvectors via flatnonzero.  These replace
the succinct bitvector machinery of the reference ([U] succinct/bit_vector.hpp
— upstream ot/ds2i submodule; /root/reference was empty this round, SURVEY.md
§0): per-element select does not pay in Python, so decode is block-wise and
`next_geq` becomes np.searchsorted over decoded blocks (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack each value into ``width`` bits, MSB-first, byte-aligned at the end."""
    if width == 0 or len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack_bits → uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64))
    return bits @ weights


def pack_unary_positions(positions: np.ndarray, total_bits: int) -> bytes:
    """Bitvector with 1s at ``positions`` (EF high part / unary coding)."""
    bits = np.zeros(total_bits, dtype=np.uint8)
    if len(positions):
        bits[positions] = 1
    return np.packbits(bits).tobytes()


def unpack_one_positions(buf: bytes, total_bits: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=total_bits)
    return np.flatnonzero(bits)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint ([U] ds2i/block_codecs.hpp tight_variable_byte analogue),
    vectorized: per-byte-position fills, max 10 positions for uint64."""
    v = values.astype(np.uint64, copy=False)
    if len(v) == 0:
        return b""
    nbytes = np.maximum((64 - _clz64(v) + 6) // 7, 1).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        idx = starts[mask] + k
        chunk = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = chunk | cont
    return out.tobytes()


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode n LEB128 varints, vectorized over byte positions."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)[:n]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    for k in range(int(lengths.max())):
        mask = lengths > k
        out[mask] |= (b[starts[mask] + k].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(
            7 * k
        )
    return out


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros for uint64 (0 → 64)."""
    out = np.full(len(v), 64, dtype=np.int64)
    x = v.copy()
    shift = np.int64(32)
    cnt = np.zeros(len(v), dtype=np.int64)
    while shift > 0:
        high = x >> np.uint64(shift)
        has = high != 0
        x = np.where(has, high, x)
        cnt = np.where(has, cnt + shift, cnt)
        shift //= 2
    nz = v != 0
    out[nz] = 63 - cnt[nz]
    return out


def bit_length(v: np.ndarray) -> np.ndarray:
    """bit_length per element (0 → 0).

    Fast path: np.frexp exponents are exact for values < 2^53 (every value
    representable in float64), one vectorized op instead of the 6-round
    shift loop — this runs 2-4× per block on the encode hot path."""
    v = np.asarray(v, dtype=np.uint64)
    if len(v) == 0:
        return np.zeros(0, dtype=np.int64)
    if int(v.max()) < (1 << 53):
        return np.frexp(v.astype(np.float64))[1].astype(np.int64)
    return 64 - _clz64(v)


# --- little self-describing header helpers (u32/u64 LE) ---


def put_u32(x: int) -> bytes:
    return int(x).to_bytes(4, "little")


def put_u64(x: int) -> bytes:
    return int(x).to_bytes(8, "little")


def get_u32(buf: bytes, off: int) -> tuple[int, int]:
    return int.from_bytes(buf[off : off + 4], "little"), off + 4


def get_u64(buf: bytes, off: int) -> tuple[int, int]:
    return int.from_bytes(buf[off : off + 8], "little"), off + 8
