"""round_half_up ≡ Spark F.round on DoubleType (round-5 review finding).

Spark's Round is BigDecimal.valueOf(d) — the SHORTEST decimal
representation, the same algorithm as Python's repr — then HALF_UP.
The kernel helper must agree on every input, including the class where
the vectorized float product lands within its own error of a .5
boundary (e.g. 5e-7 at 6 decimals: product 0.49999999999999994, naive
floor(+0.5) says 0.0, Spark says 1e-6).  Rank identity between the
serving kernels and the exact DataFrame path rides on this.
"""

from __future__ import annotations

import numpy as np
import pytest

from ds2s.util import round_half_up


def _spark_round(spark, values, decimals):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "i int, x double"
    )
    rows = df.select("i", F.round("x", decimals).alias("r")).collect()
    return [r["r"] for r in sorted(rows, key=lambda r: r["i"])]


ADVERSARIAL = [
    5e-7,            # the divergence witness: shortest repr ends in 5 AT the boundary
    0.5390625,       # 69/128 — exact binary tie (half-even would round down)
    0.0000015, 0.0000025, 0.0000035,   # repr-5 ladder at the 7th decimal
    2.675, 1.0000005, 12.3456785,
    0.1 + 0.2,       # 0.30000000000000004
    1 / 3, 2 / 3, 1e-7, 9.9999995, 0.9999995,
    0.0,
]


def test_adversarial_class_matches_spark(spark):
    vals = ADVERSARIAL + [-v for v in ADVERSARIAL]
    for decimals in (4, 6):
        got = round_half_up(np.array(vals), decimals).tolist()
        exp = _spark_round(spark, vals, decimals)
        assert got == pytest.approx(exp, abs=0), (decimals, list(zip(vals, got, exp)))


def test_fuzz_matches_spark(spark):
    rng = np.random.default_rng(5)
    # BM25-score-shaped magnitudes plus tiny values near the round-off floor
    vals = np.concatenate([
        rng.uniform(0, 40, 400),
        rng.uniform(0, 1e-5, 100),
        -rng.uniform(0, 40, 100),
    ])
    got = round_half_up(vals, 6).tolist()
    exp = _spark_round(spark, vals.tolist(), 6)
    assert got == pytest.approx(exp, abs=0)


def test_vectorized_fast_path_untouched():
    """Unambiguous inputs take the pure-numpy path (no Decimal calls) —
    verify the outputs equal the naive formula where it is correct."""
    x = np.array([1.23456712, 7.5, 0.1234565000001, 33.333333])
    assert round_half_up(x, 6).tolist() == [1.234567, 7.5, 0.123457, 33.333333]
