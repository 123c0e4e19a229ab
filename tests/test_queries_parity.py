"""Driver-gate replica: every SQL-checkable queries() entry must match its
oracle_sql() twin via DuckDB at sf0.001 (the driver runs the same comparison
at sf0.01 — tools/check_parity.py runs it standalone at any sf)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_table(x) -> pa.Table:
    if isinstance(x, pa.Table):
        return x
    if isinstance(x, pd.DataFrame):
        return pa.Table.from_pandas(x, preserve_index=False)
    import ray.data
    if isinstance(x, ray.data.Dataset):
        return pa.concat_tables(
            list(x.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    raise TypeError(type(x))


def canon(t: pa.Table) -> pa.Table:
    t = t.select(sorted(t.column_names)).combine_chunks()
    keys = [(c, "ascending") for c in t.column_names
            if not pa.types.is_nested(t.schema.field(c).type)]
    return t.take(pc.sort_indices(t, sort_keys=keys)) if keys else t


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _names():
    from tiflow_ray.queries import REGISTRY
    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_parity(name, con):
    from tiflow_ray.queries import REGISTRY
    fn, sql = REGISTRY[name]
    got = canon(to_table(fn(SF)))
    if sql is None:
        assert got.num_rows >= 0  # rows-only contract
        return
    exp = canon(con.sql(sql).arrow())
    assert got.num_rows == exp.num_rows
    assert got.schema == exp.schema, f"\ngot {got.schema}\nexp {exp.schema}"
    assert got.equals(exp.cast(got.schema))
