from __future__ import annotations

import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


@pytest.fixture(scope="session")
def spark():
    from ds2s.session import get_spark

    s = get_spark(app="ds2s-tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def idx001(spark):
    """Index over the sf0.001 documents fixture (500 docs)."""
    from ds2s.corpus import load_documents
    from ds2s.invert import build_index

    return build_index(load_documents(spark, "/root/testdata/sf0.001"))


@pytest.fixture(scope="session")
def synth_idx(spark):
    """Index over the synthetic north-rule corpus (300 docs, Zipfian)."""
    from ds2s.corpus import synth_corpus
    from ds2s.invert import build_index

    return build_index(synth_corpus(spark))
