"""Small numeric helpers shared by the Python kernels."""

from __future__ import annotations

import numpy as np


def round_half_up(x: np.ndarray, decimals: int) -> np.ndarray:
    """Round half AWAY from zero, matching Spark's ``F.round`` and DuckDB's
    ``round`` — numpy's ``np.round`` is half-even and disagrees on exact
    binary ties (e.g. 69/128 at 6 decimals).

    Spark's Round on DoubleType is ``BigDecimal.valueOf(d)`` (the SHORTEST
    decimal representation, same algorithm as Python's ``repr``) +
    HALF_UP.  The vectorized ``floor(|x|·10^d + 0.5)`` agrees except when
    the float product lands within its own rounding error of a .5
    boundary (round-5 review: ``5e-7`` at 6 decimals → product
    0.49999999999999994, floor says 0.0, Spark says 1e-6).  Those rare
    ambiguous elements are resolved per-element the way Spark does;
    everything else stays one numpy pass."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    ax = np.abs(x) * scale
    out = np.floor(ax + 0.5) / scale * np.sign(x)
    frac = ax - np.floor(ax)
    # float-product error is ≤ ~1e-8 absolute on the fractional part for
    # any plausible score magnitude; 1e-6 is a comfortably safe band
    amb = np.abs(frac - 0.5) < 1e-6
    if amb.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-int(decimals))
        flat, xf = out.reshape(-1), x.reshape(-1)
        for i in np.nonzero(amb.reshape(-1))[0]:
            flat[i] = float(
                Decimal(repr(float(xf[i]))).quantize(q, rounding=ROUND_HALF_UP)
            )
    return out
