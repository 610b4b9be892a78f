"""Driver-contract simulation: run each queries() entry and its oracle_sql()
side by side on sf0.001 and compare row-count + schema + order-insensitive
values (the CORRECTNESS_r{N}.json gate)."""

import glob
import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _oracle_con():
    con = duckdb.connect()
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.splitext(os.path.basename(f))[0]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # Widen within a dtype family (the driver's hash tolerates int32 vs
        # int64 / float32 vs float64 — verified in CORRECTNESS_r01: label_stats
        # int32 and similarity_top10 float32 both hash-matched) but NOT across
        # families (int64 vs HUGEINT->float64 failed 4 queries in r1).
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _as_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


SQL_KEYS = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(name):
    q = entry_mod.queries()[name]
    got = _normalize(_as_df(q(SF_DIR)))
    con = _oracle_con()
    exp = _normalize(con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    # check_dtype=True replicates the driver's hash gate: DuckDB HUGEINT sums
    # land as float64 in pandas while the engine emits int64 — the values hash
    # differently even when numerically equal (VERDICT r1 "What's wrong" #1).
    pd.testing.assert_frame_equal(got, exp, check_dtype=True, check_exact=False, rtol=1e-6)


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    res = _as_df(entry_mod.queries()[name](SF_DIR))
    assert res is not None
    assert len(res.columns) > 0


def test_entry_smoke():
    res = entry_mod.entry()
    df = _as_df(res)
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_budget_trim_cross_batch_overflow(tmp_path):
    """Regression (r5 code review): the pre-trim must keep each (batch,
    source) run's FIRST overflow doc — dropping it removes its n_chars
    from later docs' global cumsum and over-keeps docs past the budget
    when a source spans batches. Crafted so block 1 overflows (3000+3000)
    and block 2 holds a higher doc_id that must NOT be kept (true cum
    7000 > 5000)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastpasta_ray.pipelines.queries import QUERIES

    d = str(tmp_path / "sfx")
    os.makedirs(d)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "source": pa.array(["s", "s", "s"]),
            "n_chars": pa.array([3000, 3000, 1000], type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    got = QUERIES["budget_trim"](d).to_pydict()
    # only doc 1 fits the 5000 budget (cum 3000, 6000, 7000)
    assert got == {"source": ["s"], "n_docs": [1], "n_chars_kept": [3000]}
