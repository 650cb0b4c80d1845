"""Empty-input hostile axis (r17): every declared query must execute —
not crash — on structurally-identical but zero-row tables. An empty
partition/slice of a new corpus is a legal input at 100 TB scale; the
first sweep of this axis found five vector-family IndexErrors at
plan-construction time, two streaming state-dir reads that assumed at
least one emission, and profile_diff manufacturing a 0.0 null-rate on
zero rows."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

QUERIES, _ = entry._registry()
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_dir(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_tables")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_on_empty_tables(spark, empty_dir, name):
    df = QUERIES[name](spark, empty_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_empty_codebook_raises(spark):
    from physioview_spark.llm.similarity import assign_ivf_bucket
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="non-empty"):
        assign_ivf_bucket(F.col("embedding"), [])


def test_profile_diff_null_rate_is_null_on_empty(spark):
    from physioview_spark.operators.validate import profile, profile_diff

    empty = spark.createDataFrame([], "doc_id long, lang string")
    prof = profile(empty)
    out = {r["column"]: r for r in profile_diff(prof, prof).collect()}
    # null RATE over zero rows is undefined -> the delta must be NULL
    # (not 0.0) and must not raise the null_rate flag
    for c in ("doc_id", "lang"):
        assert out[c]["null_rate_delta"] is None
        assert "null_rate" not in (out[c]["flags"] or "")
