"""Local replica of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB (row count, schema, sorted-value
equality). Usage: python tools/check_parity.py [sf_dir] [name ...]"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

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
    if keys:
        t = t.take(pc.sort_indices(t, sort_keys=keys))
    return t


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from tiflow_ray import queries as Q
    qs, sqls = Q.queries(), Q.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{sf}/{t}.parquet')")

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_table(fn(sf)))
        except Exception as e:
            print(f"{name:24s} RAY ERROR: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in sqls:
            print(f"{name:24s} rows={got.num_rows:7d}  (rows-only oracle)")
            continue
        exp = canon(con.sql(sqls[name]).arrow())
        ok_rows = got.num_rows == exp.num_rows
        ok_schema = got.schema == exp.schema
        ok_vals = False
        if ok_rows and got.column_names == exp.column_names:
            try:
                ok_vals = got.equals(exp.cast(got.schema))
            except Exception:
                ok_vals = False
        status = "OK " if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(f"{name:24s} {status} rows={got.num_rows}/{exp.num_rows} "
              f"schema={'=' if ok_schema else 'DIFF'} vals={'=' if ok_vals else 'DIFF'}")
        if status == "FAIL":
            failed.append(name)
            if not ok_schema:
                print("   got:", got.schema)
                print("   exp:", exp.schema)
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all parity checks passed")


if __name__ == "__main__":
    main()
