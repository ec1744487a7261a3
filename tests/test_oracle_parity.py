"""Driver-gate emulation: every queries() entry must match its DuckDB
oracle at sf0.01 (row count + column names + values)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _entry_names():
    import __spark_entry__ as E

    return sorted(E.queries().keys())


@pytest.mark.parametrize("name", _entry_names())
def test_oracle_parity(spark, name):
    import __spark_entry__ as E
    from compare_util import assert_match, duck_run

    qs, osql = E.queries(), E.oracle_sql()
    if name not in osql:
        df = qs[name](spark, SF)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_match(qs[name](spark, SF), duck_run(osql[name], SF), name)


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
