"""Local replica of the driver's t2 gate: run every catalog query in Spark
AND its DuckDB oracle on the same parquet, compare row count + sorted
values (order-insensitive, column-name-sorted)."""

import math

import duckdb
import pytest

from vul_dbgen_spark.queries.catalog import REGISTRY, TABLES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    pdf = df_pandas[cols]
    rows = []
    for tup in pdf.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(round(v, 6))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    got = spec.fn(spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    want = con.sql(spec.oracle).df()
    con.close()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    if not spec.expect_empty:
        # empty==empty is vacuously green (round 2's q9: a LIKE literal
        # absent from the testdata made a 5-way join "pass" on 0 rows);
        # any query that may legitimately return nothing must say so via
        # expect_empty=True at registration
        assert len(got) > 0, f"{name}: empty result — parity would be vacuous"
    cg, cw = _canon(got), _canon(want)
    mism = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={cg[mism[0]]} oracle={cw[mism[0]]}"
    )


def test_rowsonly_queries_run(spark, sf_dir):
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            n = spec.fn(spark, sf_dir).count()
            assert n >= 0, name
