"""Engine configuration: scorer + index parameters.

Reference parity: ds2i's BM25 scorer ([U] ds2i/bm25.hpp — upstream ot/ds2i
layout; /root/reference was empty this round, see SURVEY.md §0) uses
k1=1.2, b=0.5, Robertson idf ``log((N-df+0.5)/(df+0.5))`` clamped at 1e-6
and multiplied by ``(1+k1)``; the doc-side weight is
``tf / (tf + k1*(1-b+b*len/avg_len))``.

Everything rank-affecting lives in one frozen dataclass so the exact
(DataFrame) path and the pruned (WAND/BMW kernel) path cannot diverge
(SURVEY.md §7.5 float-determinism requirement).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Scorer:
    """BM25 parameters, shared by every scoring path.

    Float discipline: float64 accumulation everywhere; per-doc score is the
    sum of per-term contributions in term-ID order; ties broken by
    (score DESC, doc ASC).
    """

    k1: float = 1.2
    b: float = 0.5
    idf_epsilon: float = 1e-6  # ds2i clamps idf at epsilon ([U] ds2i/bm25.hpp)

    def idf(self, df: float, n_docs: float) -> float:
        """Robertson idf — the ONE python-side definition, used by both
        block-max encode kernels and the serving cursor resolver.  np.log,
        not math.log: the scoring kernels compute contributions with numpy,
        and pruning correctness requires the block-max upper bound and the
        kernel score to come from the same libm entry point bit-for-bit."""
        import numpy as np

        raw = float(np.log((n_docs - df + 0.5) / (df + 0.5)))
        return max(self.idf_epsilon, raw) * (1.0 + self.k1)

    def sql_idf(self, df_expr: str, n_expr: str) -> str:
        """ANSI-SQL idf expression, valid in both Spark SQL and DuckDB."""
        return (
            f"greatest({self.idf_epsilon!r}, "
            f"ln(({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))) "
            f"* (1.0 + {self.k1!r})"
        )

    def sql_doc_weight(self, tf_expr: str, len_expr: str, avg_expr: str) -> str:
        """ANSI-SQL doc-side weight, valid in both Spark SQL and DuckDB."""
        return (
            f"({tf_expr} * 1.0) / ({tf_expr} + {self.k1!r} * "
            f"(1.0 - {self.b!r} + {self.b!r} * ({len_expr} * 1.0) / {avg_expr}))"
        )


@dataclass(frozen=True)
class IndexConfig:
    """Build-time parameters frozen into the index manifest."""

    block_size: int = 128  # ds2i block family block length ([U] ds2i/block_freq_index.hpp)
    token_pattern: str = "[a-z0-9]+"  # engine-owned tokenizer (SURVEY.md §2.7)
    n_salt: int = 8  # hot-term salting fanout for the two-stage posting merge
    hot_term_df: int = 10_000  # df threshold above which a term is salted
    doc_codec: str = "pef"  # whole-list/segment family default (freq_index analogue)
    block_codec: str = "optpfd"  # 128-posting block family default — ds2i's
    # block_freq_index uses OptPFD/varint blocks; PEF is the whole-list
    # family, and its per-chunk DP costs ~100× more per 128-block for no
    # size win at that granularity
    # (choices: ef|uniform_pef|pef|optpfd|gvb|interp|auto)
    tf_codec: str = "optpfd"  # strict-EF over cumsum (pef family) or block codec
    # upstream keeps duplicate cursors (a repeated query term scores with
    # weight = multiplicity); True collapses to one cursor per (qid, term)
    # in BOTH the exact path (query._with_ids) and the serving path
    # (ServingIndex._resolve_cursors)
    dedupe_query_terms: bool = False
    scorer: Scorer = field(default_factory=Scorer)

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        """Rebuild the frozen config persisted in an index manifest
        (_index.json) — serving MUST score with the build-time scorer or
        block-max upper bounds silently desync from kernel scores."""
        d = dict(d)
        scorer = d.pop("scorer", None)
        if isinstance(scorer, dict):
            d["scorer"] = Scorer(**scorer)
        elif scorer is not None:
            d["scorer"] = scorer
        return cls(**d)


DEFAULT_CONFIG = IndexConfig()
DEFAULT_SCORER = DEFAULT_CONFIG.scorer
