from __future__ import annotations

import glob
import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from raise_featurestore_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle setup."""

    def make(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(path)[: -len(".parquet")]
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
        return con

    return make


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(spark_df, oracle_df: pd.DataFrame, rtol: float = 1e-6) -> None:
    """Order-insensitive compare mirroring the driver: row count, column
    names, and values (tolerant on floats)."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_df)
    assert list(got.columns) == list(want.columns), f"{list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            g = pd.to_numeric(g, errors="coerce").astype(float)
            w = pd.to_numeric(w, errors="coerce").astype(float)
            for i, (a, b) in enumerate(zip(g, w)):
                if (isinstance(a, float) and math.isnan(a)) and (
                    isinstance(b, float) and math.isnan(b)
                ):
                    continue
                assert a == pytest.approx(b, rel=rtol, abs=1e-9), f"col {c} row {i}: {a} != {b}"
        else:
            pd.testing.assert_series_equal(
                g.astype(str), w.astype(str), check_names=False, check_dtype=False
            )
