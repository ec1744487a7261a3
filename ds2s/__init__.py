"""ds2s — "ds2i on Spark": a PySpark-native inverted-index + BM25 engine.

Brand-new implementation (not a port) of the query and data-processing
capabilities of Sparklexs/ds2i: docID-sorted posting lists, partitioned
Elias-Fano + block codecs, block-max metadata, top-k conjunctive /
disjunctive BM25 queries with (block-max) WAND.  See /root/repo/SURVEY.md.
"""

from .config import DEFAULT_CONFIG, IndexConfig, Scorer  # noqa: F401
