"""Indexed sequences and Partitioned Elias-Fano.

Semantics per the reference ([U] ds2i/indexed_sequence.hpp,
[U] ds2i/partitioned_sequence.hpp, [U] ds2i/uniform_partitioned_sequence.hpp,
[U] ds2i/optimal_partition.hpp — upstream ot/ds2i layout, SURVEY.md §2.2;
algorithm from Ottaviano & Venturini, "Partitioned Elias-Fano Indexes",
SIGIR 2014):

- ``indexed_sequence``: per-(chunk of a) list cost-based choice among
  {Elias-Fano, plain ranked bitvector, implicit all-ones} with a 2-bit
  type tag;
- ``partitioned``: split a strictly-increasing list into chunks, store
  chunk upper bounds + endpoints as EF sequences, encode each chunk
  *relative to its base* as an indexed_sequence;
- chunk boundaries: fixed length (uniform) or a cost-minimizing DP with
  geometric candidate windows (ε-approximate, the same idea as the
  reference's optimal_partition, our own implementation).

Bitstreams are self-describing and ours; the contract is exact round-trip
plus the PEF < uniform-EF size ordering (BASELINE.md (b))."""

from __future__ import annotations

import numpy as np

from .bitio import get_u32, pack_unary_positions, put_u32, unpack_one_positions
from .ef import ef_bit_cost, ef_decode, ef_encode

TYPE_EF = 0
TYPE_BITVECTOR = 1
TYPE_ALL_ONES = 2


def _rb_bit_cost(universe: int) -> int:
    return int(universe)


def best_type(universe: int, n: int) -> int:
    """Cost-based representation choice ([U] ds2i/indexed_sequence.hpp)."""
    if n == universe:
        return TYPE_ALL_ONES
    if _rb_bit_cost(universe) < ef_bit_cost(universe, n):
        return TYPE_BITVECTOR
    return TYPE_EF


def indexed_bit_cost(universe: int, n: int) -> int:
    if n == universe:
        return 8  # tag byte only
    return 8 + min(_rb_bit_cost(universe), ef_bit_cost(universe, n)) + 96  # + header


def iseq_encode(values: np.ndarray, universe: int) -> bytes:
    """Strictly increasing values in [0, universe)."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    t = best_type(universe, n)
    if t == TYPE_ALL_ONES:
        return bytes([TYPE_ALL_ONES]) + put_u32(n)
    if t == TYPE_BITVECTOR:
        body = put_u32(n) + put_u32(universe) + pack_unary_positions(
            v.astype(np.int64), int(universe)
        )
        return bytes([TYPE_BITVECTOR]) + body
    return bytes([TYPE_EF]) + ef_encode(v, universe)


def iseq_decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    t = buf[offset]
    off = offset + 1
    if t == TYPE_ALL_ONES:
        n, off = get_u32(buf, off)
        return np.arange(n, dtype=np.uint64), off
    if t == TYPE_BITVECTOR:
        n, off = get_u32(buf, off)
        universe, off = get_u32(buf, off)
        nbytes = (universe + 7) // 8
        ones = unpack_one_positions(buf[off : off + nbytes], universe)
        return ones.astype(np.uint64), off + nbytes
    vals, _, off = ef_decode(buf, off)
    return vals, off


# ---------------------------------------------------------------------------
# Partitioning
# ---------------------------------------------------------------------------


def uniform_partition(n: int, part_size: int = 128) -> np.ndarray:
    """Endpoints [e_1, ..., e_k = n] of fixed-size chunks."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    return np.arange(part_size, n + part_size, part_size, dtype=np.int64).clip(max=n)


def _indexed_bit_cost_vec(universe: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Vectorized indexed_bit_cost (identical semantics to the scalar)."""
    from .bitio import bit_length as _bl

    u = universe.astype(np.int64)
    nn = n.astype(np.int64)
    # ef_low_bits: 0 when u<=n, else bit_length(u//n) - 1
    ratio = np.where(nn > 0, u // np.maximum(nn, 1), 0)
    l = np.maximum(_bl(ratio.astype(np.uint64)).astype(np.int64) - 1, 0)
    l = np.where((nn == 0) | (u <= nn), 0, l)
    high_len = nn + (u >> l.astype(np.uint64).astype(np.int64)) + 1
    ef_cost = nn * l + high_len
    cost = 8 + np.minimum(u, ef_cost) + 96
    return np.where(nn == u, 8, cost)


def optimal_partition(values: np.ndarray, max_part: int = 2048) -> np.ndarray:
    """ε-approximate cost-minimizing chunk endpoints.

    DP over candidate window lengths in geometric progression (1.3×) up to
    ``max_part`` — same spirit as the reference's optimal_partition
    (ε₁≈0.03, ε₂≈0.3), implemented independently: dp[j] = min over
    candidate i of dp[i] + cost(i, j).  O(n · log_{1.3}(max_part)); the
    candidate scan per j is one vectorized numpy pass (this runs per
    posting block on the build hot path)."""
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # candidate window lengths
    lens = [1]
    while lens[-1] < max_part:
        lens.append(min(max(int(lens[-1] * 1.3), lens[-1] + 1), max_part))
    lens = np.unique(np.array(lens, dtype=np.int64))

    dp = np.zeros(n + 1, dtype=np.float64)
    parent = np.zeros(n + 1, dtype=np.int64)
    vals = np.asarray(values, dtype=np.int64)
    for j in range(1, n + 1):
        cand = j - lens[lens <= j]  # candidate chunk starts (descending)
        base = np.where(cand > 0, vals[cand - 1] + 1, 0) - 1
        universe = vals[j - 1] - base
        costs = _indexed_bit_cost_vec(universe, (j - cand))
        tot = dp[cand] + costs
        k = int(np.argmin(tot))
        dp[j] = tot[k]
        parent[j] = cand[k]
    ends = []
    j = n
    while j > 0:
        ends.append(j)
        j = int(parent[j])
    return np.array(sorted(ends), dtype=np.int64)


def pef_encode(
    values: np.ndarray,
    universe: int,
    partition: str = "opt",
    part_size: int = 128,
) -> bytes:
    """Partitioned Elias-Fano over a strictly increasing sequence.

    Layout: u32 n | u32 n_parts | EF(chunk last-values) | EF(chunk endpoints)
            | concatenated relative indexed_sequences."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return put_u32(0) + put_u32(0)
    if partition == "uniform":
        ends = uniform_partition(n, part_size)
    else:
        ends = optimal_partition(v)
    n_parts = len(ends)
    uppers = v[ends - 1]  # last value of each chunk (monotone)
    head = put_u32(n) + put_u32(n_parts)
    head += ef_encode(uppers, int(universe))
    head += ef_encode(ends.astype(np.uint64), n + 1)
    body = bytearray()
    prev_end = 0
    base = -1
    for k in range(n_parts):
        e = int(ends[k])
        chunk = v[prev_end:e]
        cu = int(chunk[-1]) - base  # relative universe, last rel value = cu-1
        rel = chunk - np.uint64(base + 1)
        body += iseq_encode(rel, cu)
        base = int(chunk[-1])
        prev_end = e
    return head + bytes(body)


def pef_decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    n, off = get_u32(buf, offset)
    n_parts, off = get_u32(buf, off)
    if n == 0:
        return np.zeros(0, dtype=np.uint64), off
    uppers, _, off = ef_decode(buf, off)
    ends, _, off = ef_decode(buf, off)
    out = np.zeros(n, dtype=np.uint64)
    prev_end = 0
    base = -1
    for k in range(n_parts):
        e = int(ends[k])
        rel, off = iseq_decode(buf, off)
        out[prev_end:e] = rel + np.uint64(base + 1)
        base = int(uppers[k])
        prev_end = e
    return out, off
