"""ANSI-SQL (DuckDB) oracles for the driver's correctness gate.

Each string recomputes the relevant slice of the pipeline from the raw
``documents`` view with the SAME frozen semantics as the Spark path:
tokenizer ``regexp_extract_all(lower(text), '[a-z0-9]+')`` (identical
builtin in both engines), BM25 constants from ds2s.config.Scorer, dense
termIDs by ORDER BY term, duplicate query cursors kept, tie-break
(score DESC, doc ASC).  Scores are rounded to 4 decimals in BOTH engines
(ranking uses 6-decimal rounding) so the driver's value-hash is immune to
last-ulp summation-order differences (SURVEY.md §7.5).
"""

from __future__ import annotations

from .config import DEFAULT_CONFIG, Scorer
from .queryset import DEFAULT_K, queries_sql_values

_PAT = DEFAULT_CONFIG.token_pattern


def _base_ctes(scorer: Scorer = DEFAULT_CONFIG.scorer) -> str:
    idf = scorer.sql_idf("l.df", "s.n_docs")
    w_d = scorer.sql_doc_weight("t.tf", "z.len", "s.avg_len")
    return f"""
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_PAT}')) AS term
  FROM documents
),
sizes AS (
  SELECT doc_id, cast(len(regexp_extract_all(lower(text), '{_PAT}')) AS INT) AS len
  FROM documents
),
stats AS (
  SELECT cast(count(*) AS DOUBLE) AS n_docs,
         cast(sum(len) AS DOUBLE) / count(*) AS avg_len
  FROM sizes
),
tf AS (
  SELECT term, doc_id, cast(count(*) AS INT) AS tf FROM tok GROUP BY term, doc_id
),
lexicon AS (
  SELECT term, cast(row_number() OVER (ORDER BY term) - 1 AS INT) AS term_id,
         cast(count_doc AS INT) AS df
  FROM (SELECT term, count(*) AS count_doc FROM tf GROUP BY term)
),
qterms AS (
  SELECT * FROM (VALUES
    {queries_sql_values()}
  ) AS q(qid, ord, term)
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum(({idf}) * ({w_d})) AS score
  FROM qterms q
  JOIN lexicon l USING (term)
  JOIN tf t USING (term)
  JOIN sizes z ON z.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, t.doc_id
)"""


def sql_lexicon() -> str:
    return f"WITH {_base_ctes()} SELECT term, term_id, df FROM lexicon ORDER BY term_id"


def sql_sizes() -> str:
    return f"WITH {_base_ctes()} SELECT doc_id, len FROM sizes ORDER BY doc_id"


def sql_collection_stats() -> str:
    return f"""WITH {_base_ctes()}
SELECT cast(s.n_docs AS BIGINT) AS n_docs,
       round(s.avg_len, 6) AS avg_len,
       (SELECT cast(count(*) AS BIGINT) FROM lexicon) AS n_terms,
       (SELECT cast(count(*) AS BIGINT) FROM tf) AS n_postings
FROM stats s"""


def sql_invert_tf() -> str:
    return f"""WITH {_base_ctes()}
SELECT l.term_id, t.doc_id, t.tf FROM tf t JOIN lexicon l USING (term)
ORDER BY term_id, doc_id"""


def sql_postings_arrays() -> str:
    """Posting-list arrays flattened back to rows with an in-list position —
    verifies docID-sortedness + density of the array representation."""
    return f"""WITH {_base_ctes()}
SELECT l.term_id,
       cast(row_number() OVER (PARTITION BY l.term_id ORDER BY t.doc_id) - 1 AS INT) AS pos,
       t.doc_id, t.tf
FROM tf t JOIN lexicon l USING (term)
ORDER BY term_id, pos"""


def _sql_topk(members_filter: str, k: int) -> str:
    return f"""
SELECT qid, cast(rank AS INT) AS rank, doc_id, round(score, 4) AS score
FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored {members_filter}
) WHERE rank <= {k}"""


def sql_ranked_or(k: int = DEFAULT_K) -> str:
    return f"WITH {_base_ctes()} {_sql_topk('', k)}"


def _sql_and_members() -> str:
    """Conjunction membership (docs containing ALL of a query's distinct
    terms) — ONE definition consumed by both ranked-AND and AND-count so
    the frozen semantics cannot drift apart (round-5 review)."""
    return """
need AS (SELECT qid, count(DISTINCT term) AS n_need FROM qterms GROUP BY qid),
members AS (
  SELECT q.qid, t.doc_id
  FROM (SELECT DISTINCT qid, term FROM qterms) q
  JOIN tf t USING (term)
  GROUP BY q.qid, t.doc_id
  HAVING count(*) = (SELECT n_need FROM need n WHERE n.qid = q.qid)
)"""


def sql_ranked_and(k: int = DEFAULT_K) -> str:
    return (
        f"WITH {_base_ctes()}, {_sql_and_members()} "
        + _sql_topk("JOIN members USING (qid, doc_id)", k)
    )


def sql_and_count() -> str:
    return f"""WITH {_base_ctes()},
{_sql_and_members()},
cnt AS (SELECT qid, count(*) AS matches FROM members GROUP BY qid)
SELECT q.qid, cast(coalesce(c.matches, 0) AS BIGINT) AS matches
FROM (SELECT DISTINCT qid FROM qterms) q LEFT JOIN cnt c USING (qid)
ORDER BY qid"""


def sql_or_count() -> str:
    return f"""WITH {_base_ctes()},
cnt AS (
  SELECT q.qid, count(DISTINCT t.doc_id) AS matches
  FROM (SELECT DISTINCT qid, term FROM qterms) q
  JOIN tf t USING (term)
  GROUP BY q.qid
)
SELECT q.qid, cast(coalesce(c.matches, 0) AS BIGINT) AS matches
FROM (SELECT DISTINCT qid FROM qterms) q LEFT JOIN cnt c USING (qid)
ORDER BY qid"""


def sql_wand_max(scorer: Scorer = DEFAULT_CONFIG.scorer) -> str:
    """Per-term max BM25 contribution — wand_data ([U] ds2i/wand_data.hpp)."""
    idf = scorer.sql_idf("l.df", "s.n_docs")
    w_d = scorer.sql_doc_weight("t.tf", "z.len", "s.avg_len")
    return f"""WITH {_base_ctes()}
SELECT l.term_id, round(max(({idf}) * ({w_d})), 4) AS max_score
FROM tf t
JOIN lexicon l USING (term)
JOIN sizes z ON z.doc_id = t.doc_id
CROSS JOIN stats s
GROUP BY l.term_id
ORDER BY term_id"""


def sql_block_max(block_size: int = DEFAULT_CONFIG.block_size,
                  scorer: Scorer = DEFAULT_CONFIG.scorer) -> str:
    """Per-128-posting-block (last_doc, max score) — block-max metadata
    (BASELINE.json:6; Ding & Suel BMW)."""
    idf = scorer.sql_idf("df", "n_docs")
    w_d = scorer.sql_doc_weight("tf", "len", "avg_len")
    return f"""WITH {_base_ctes()},
pos AS (
  SELECT l.term_id, t.doc_id, t.tf, z.len, s.n_docs, s.avg_len, l.df,
         cast(floor((row_number() OVER (PARTITION BY l.term_id ORDER BY t.doc_id) - 1)
              / {block_size}) AS INT) AS block_id
  FROM tf t
  JOIN lexicon l USING (term)
  JOIN sizes z ON z.doc_id = t.doc_id
  CROSS JOIN stats s
)
SELECT term_id, block_id,
       cast(count(*) AS INT) AS n,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc,
       round(max(({idf}) * ({w_d})), 4) AS block_max_score
FROM pos
GROUP BY term_id, block_id
ORDER BY term_id, block_id"""
