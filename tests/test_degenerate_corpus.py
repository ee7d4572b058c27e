"""Every documents/embeddings registry query must SURVIVE a degenerate
corpus under the session's default ANSI mode AND still agree with its
DuckDB oracle on it — NULL/empty/whitespace-only text, one-word docs,
NULL source/lang/doc_id, a zero embedding sitting ON a centroid slot,
and a NULL embedding. This generalizes the round-5 per-operator ANSI
fixes (cosine /0, element_at bounds, split('') phantom rows) into a
standing gate: a future operator that divides by a token count or
indexes an array can't ship a degenerate-corpus crash or an
engine-divergent NULL rule without this file going red."""

from __future__ import annotations

import inspect
import shutil

import duckdb
import numpy as np
import pandas as pd
import pytest

from crab_spark.oracle import TABLES, compare_one, register_views
from crab_spark.queries import QUERIES

SRC_SF = "/root/testdata/sf0.001"

_DOC_ROWS = [
    # (doc_id, text, lang, source)
    (0, None, "en", "s1"),                        # NULL text
    (1, "", "en", "s1"),                          # empty text
    (2, "   \n\t  ", "de", "s1"),                 # whitespace-only
    (3, "word", None, "s2"),                      # one word, NULL lang
    (4, "the cat is on the mat and it sat there", "en", None),  # NULL source
    (5, "the cat is on the mat and it sat there", "en", "s2"),  # dup of 4
    (None, "a null id row with enough words to pass gates", "en", "s2"),
    (7, "unique fresh content words never repeated elsewhere at all", "fr", "s3"),
    (8, "# ### ... #!? ###", "en", "s3"),          # symbol soup
    (9, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "es", "s3"),
]


@pytest.fixture(scope="module")
def degenerate_sf(spark, tmp_path_factory):
    """An sf dir whose documents/embeddings are adversarial; the TPC-H
    tables and events are the sf0.001 files unchanged."""
    d = tmp_path_factory.mktemp("degsf")
    for t in TABLES:
        if t not in ("documents", "embeddings"):
            shutil.copy(f"{SRC_SF}/{t}.parquet", d / f"{t}.parquet")
    docs = pd.DataFrame(
        _DOC_ROWS, columns=["doc_id", "text", "lang", "source"]
    ).astype({"doc_id": "Int64"})
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    docs.to_parquet(d / "documents.parquet", index=False)
    rng = np.random.default_rng(11)
    emb = pd.DataFrame({
        "vec_id": pd.array(range(12), dtype="Int64"),
        "embedding": [
            np.zeros(64, dtype=np.float32)            # zero vec ON a
            if i == 3 else                            # centroid slot
            (None if i == 9 else
             rng.normal(size=64).astype(np.float32))  # NULL embedding
            for i in range(12)
        ],
        "label": pd.array([i % 3 if i % 4 else None for i in range(12)],
                          dtype="Int32"),
    })
    emb.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def _uses_degenerate_tables(fn) -> bool:
    src = inspect.getsource(fn)
    return '"documents"' in src or '"embeddings"' in src


_TARGETS = sorted(n for n, f in QUERIES.items() if _uses_degenerate_tables(f))


@pytest.fixture(scope="module")
def con(degenerate_sf):
    c = duckdb.connect()
    register_views(c, degenerate_sf)
    yield c
    c.close()


@pytest.mark.parametrize("name", _TARGETS)
def test_degenerate_oracle_parity(spark, con, name, degenerate_sf):
    ok, detail = compare_one(spark, con, name, degenerate_sf)
    assert ok, f"{name} on the degenerate corpus: {detail}"
