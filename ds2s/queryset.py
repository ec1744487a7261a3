"""Fixed reference-style query set (FIXTURES.md F3).

ds2i queries are one whitespace-separated term line each ([U]
ds2i/queries.cpp; SURVEY.md §1.4).  We own the lexicon, so terms are
strings.  The set is a frozen literal so the Spark path and the DuckDB
oracle SQL consume byte-identical inputs.

Mix: single frequent / single rare ('dup'), multi-term AND/OR material,
one term absent from the corpus ('zzzmissing' — AND must go empty, OR
ignores it), a duplicate term inside one query (kept as two cursors,
upstream behavior — ds2i parses the term line into a plain vector and
opens one cursor per entry).
"""

from __future__ import annotations

QUERIES: list[tuple[int, list[str]]] = [
    (0, ["spark"]),
    (1, ["dup"]),
    (2, ["zzzmissing"]),
    (3, ["hash", "join"]),
    (4, ["sort", "merge", "join"]),
    (5, ["batch", "stream"]),
    (6, ["dup", "table"]),
    (7, ["zzzmissing", "scan"]),
    (8, ["filter", "filter"]),  # duplicate term: two cursors
    (9, ["query", "plan", "scan", "agg", "window"]),
    (10, ["a", "the"]),
    (11, ["column", "row", "value"]),
    (12, ["fast", "slow"]),
    (13, ["customer", "order", "line"]),
    (14, ["vector", "data", "big"]),
    (15, ["key", "value", "dup"]),
    (16, ["group", "order", "sort", "small"]),
    (17, ["window", "stream", "table", "batch", "merge"]),
    (18, ["scan"]),
    (19, ["spark", "spark", "spark"]),  # triple duplicate
]

DEFAULT_K = 10


def queries_sql_values() -> str:
    """(qid, ord, term) rows as a SQL VALUES literal — duplicates kept,
    ord preserves in-query term order for deterministic summation."""
    rows = []
    for qid, terms in QUERIES:
        for i, t in enumerate(terms):
            # SQL-escape quotes: safe for the frozen [a-z0-9] set today,
            # total for any future fixture term (round-5 review)
            rows.append(f"({qid}, {i}, '{t.replace(chr(39), chr(39) * 2)}')")
    return ",\n    ".join(rows)


def queries_rows() -> list[tuple[int, int, str]]:
    return [(qid, i, t) for qid, terms in QUERIES for i, t in enumerate(terms)]
