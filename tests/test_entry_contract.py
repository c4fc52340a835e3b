"""Replicates the driver's correctness gate (SURVEY.md §5.2 item 3): every
queries() entry runs on Spark AND its oracle_sql() on DuckDB over the same
parquet; row count + schema + order-insensitive values must match exactly.
"""

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from master_project_spark.entry_queries import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"  # smallest scale: keep the suite fast


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(repr)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERY_NAMES = sorted(entry.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = entry.queries()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    oracle = entry.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) >= 0  # rows-only entries: must at least run
        return
    ddf = duck.execute(oracle).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    a, b = _canon(sdf), _canon(ddf)
    pd.testing.assert_frame_equal(a, b)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.fieldNames() == ["subj", "pred", "obj", "lang", "weight"]
    # round-4 ask #6: the driver-executed flagship must exercise the
    # pandas/Arrow path — the plan carries the mapInPandas extract node
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    # deterministic across invocations (the driver compares runs)
    again = entry.entry(spark).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_entry_arrow_extraction_equals_sql_twin(spark):
    """The flagship's mapInPandas extraction is row-for-row identical to
    the pure-SQL regexp_extract_all form (its in-contract oracle,
    pattern_triples)."""
    from master_project_spark import entry_queries as EQ

    sf_dir = "/root/testdata/sf0.001"
    arrow = sorted(map(tuple, EQ.pattern_triples_arrow(spark, sf_dir)
                       .collect()))
    sql = sorted(map(tuple, EQ.pattern_triples(spark, sf_dir).collect()))
    assert arrow == sql and len(arrow) > 0
