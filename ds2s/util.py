"""Small numeric helpers shared by the Python kernels."""

from __future__ import annotations

import numpy as np


def round_half_up(x: np.ndarray, decimals: int) -> np.ndarray:
    """Round half AWAY from zero, matching Spark's ``F.round`` and DuckDB's
    ``round`` — numpy's ``np.round`` is half-even and disagrees on exact
    binary ties (e.g. 69/128 at 6 decimals)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.floor(np.abs(x) * scale + 0.5) / scale * np.sign(x)
