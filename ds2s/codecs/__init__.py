"""Codec registry: self-describing encode/decode for posting payloads.

Two payload kinds per posting block/list (SURVEY.md §1.1-1.2):
- docs: strictly increasing docIDs (monotone codecs: EF / PEF families
  encode absolute values; block codecs OptPFD / group-varint encode
  gap-1 deltas as ds2i's block family does,
  [U] ds2i/block_freq_index.hpp);
- tfs: positive values ≥ 1 (prefix-sum + strict-EF for the EF family,
  [U] ds2i/positive_sequence.hpp; tf-1 values for block codecs).

First byte of every blob is the codec id, so decode is self-dispatching.
"""

from __future__ import annotations

import numpy as np

from .ef import ef_decode, ef_encode, positive_decode, positive_encode
from .interp import interp_decode, interp_encode
from .pef import pef_decode, pef_encode
from .pfd import pfd_decode, pfd_encode
from .varint import gvb_decode, gvb_encode

CODEC_IDS = {"ef": 0, "uniform_pef": 1, "pef": 2, "optpfd": 3, "gvb": 4, "interp": 5}
CODEC_NAMES = {v: k for k, v in CODEC_IDS.items()}


def encode_docs(docs: np.ndarray, universe: int, codec: str) -> bytes:
    cid = CODEC_IDS[codec]
    v = np.asarray(docs, dtype=np.uint64)
    if codec == "ef":
        body = ef_encode(v, universe)
    elif codec == "uniform_pef":
        body = pef_encode(v, universe, partition="uniform")
    elif codec == "pef":
        body = pef_encode(v, universe, partition="opt")
    elif codec == "interp":
        body = interp_encode(v, universe)
    else:
        gaps = np.diff(v, prepend=np.uint64(0))
        gaps[1:] -= np.uint64(1)  # strictly increasing → gap-1 beyond the first
        body = pfd_encode(gaps) if codec == "optpfd" else gvb_encode(gaps)
    return bytes([cid]) + body


def decode_docs(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    codec = CODEC_NAMES[buf[offset]]
    off = offset + 1
    if codec == "ef":
        vals, _, off = ef_decode(buf, off)
        return vals, off
    if codec in ("uniform_pef", "pef"):
        return pef_decode(buf, off)
    if codec == "interp":
        return interp_decode(buf, off)
    gaps, off = pfd_decode(buf, off) if codec == "optpfd" else gvb_decode(buf, off)
    if len(gaps):
        gaps = gaps.copy()
        gaps[1:] += np.uint64(1)
        return np.cumsum(gaps, dtype=np.uint64), off
    return gaps, off


def encode_tfs(tfs: np.ndarray, codec: str) -> bytes:
    cid = CODEC_IDS[codec]
    v = np.asarray(tfs, dtype=np.uint64)
    if codec in ("ef", "uniform_pef", "pef"):
        body = positive_encode(v)
    elif codec == "interp":
        # positive values → strictly-increasing prefix sums (the
        # positive_sequence trick, [U] ds2i/positive_sequence.hpp)
        cs = np.cumsum(v, dtype=np.uint64)
        body = interp_encode(cs, int(cs[-1]) + 1 if len(cs) else 1)
    else:
        body = pfd_encode(v - np.uint64(1)) if codec == "optpfd" else gvb_encode(
            v - np.uint64(1)
        )
    return bytes([cid]) + body


def decode_tfs(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    codec = CODEC_NAMES[buf[offset]]
    off = offset + 1
    if codec in ("ef", "uniform_pef", "pef"):
        return positive_decode(buf, off)
    if codec == "interp":
        cs, off = interp_decode(buf, off)
        return np.diff(cs, prepend=np.uint64(0)), off
    vals, off = pfd_decode(buf, off) if codec == "optpfd" else gvb_decode(buf, off)
    return vals + np.uint64(1), off
