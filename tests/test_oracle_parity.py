"""Emulates the driver's correctness gate: every queries() entry with a
matching oracle_sql() entry must agree with DuckDB at sf0.001 —
row count, schema (column names), and exact values after the
contract's own rounding."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF_DIR = os.environ.get("GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_unsigned_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]) and len(df) and isinstance(df[c].iloc[0], int):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


PAIRS = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", PAIRS)
def test_query_matches_duckdb(name):
    ray_df = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_df = _canon(_duck(entrymod.oracle_sql()[name]))
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    for c in ray_df.columns:
        a, b = ray_df[c].to_numpy(), sql_df[c].to_numpy()
        if np.issubdtype(ray_df[c].dtype, np.floating):
            assert np.allclose(a, b.astype(np.float64), atol=0, rtol=0), (
                f"{name}.{c}: max diff {np.abs(a - b).max()}"
            )
        else:
            assert np.array_equal(a, b), f"{name}.{c} mismatch"


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert abs(df["rank"].sum() - 1.0) < 1e-9
