"""Driver-contract smoke: every declared query executes at sf0.001 and
every declared oracle parses in DuckDB — cheap insurance against
registry typos before the driver's real gate runs."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

QUERIES, ORACLES = entry._registry()
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parses(duck, name):
    duck.execute(f"EXPLAIN {ORACLES[name]}")


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_returns_flagship(spark):
    df = entry.entry(spark)
    assert df.count() > 0


def test_priority_list_consistent():
    """Every _PRIORITY name must resolve to a registered query (catches
    typos when the rotation list is edited between rounds), the registry
    must be duplicate-free, and the priority block must fit the driver's
    50-query verification window."""
    import __spark_entry__ as e

    qs, oracles = e._registry()
    names = list(qs)
    missing = [n for n in e._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert len(set(e._PRIORITY)) == len(e._PRIORITY)
    assert len(names) == len(set(names))
    assert len(e._PRIORITY) <= 50
    assert set(e._PRIORITY) <= set(names[:50])
    # oracles reference registered queries only
    assert set(oracles) <= set(qs)
