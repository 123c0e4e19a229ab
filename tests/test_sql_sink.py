"""Batched-SQL sink: statement generation + execution semantics
(pkg/sqlmodel/multirow.go + mysql.go safe-mode analog)."""

import duckdb
import numpy as np
import pyarrow as pa

from tiflow_ray.sinks.sqlgen import (gen_deletes, gen_upserts, render_literal,
                                     statements_for_winners)


def test_render_literal_escaping_and_types():
    assert render_literal(None) == "NULL"
    assert render_literal("o'brien") == "'o''brien'"
    assert render_literal([1, 2, 3]) == "[1, 2, 3]"
    assert render_literal([1, 2], dialect="mysql") == "'[1, 2]'"
    assert render_literal(np.int32(7)) == "7"


def test_multivalue_batching_respects_max_rows():
    rows = [(f"d{i}", i) for i in range(150)]
    stmts = gen_upserts("t", ["doc_id", "v"], rows, dialect="mysql",
                        max_rows=64)
    assert len(stmts) == 3                       # 64 + 64 + 22
    assert all(s.startswith("REPLACE INTO t (doc_id, v) VALUES ") for s in stmts)
    assert stmts[0].count("(") == 64 + 1         # 64 value groups + col list
    dels = gen_deletes("t", "doc_id", [r[0] for r in rows], max_rows=64)
    assert len(dels) == 3
    assert dels[0].startswith("DELETE FROM t WHERE doc_id IN (")


def test_duckdb_dialect_upsert_is_delete_then_insert():
    stmts = gen_upserts("t", ["doc_id", "v"], [("a", 1)], dialect="duckdb")
    assert len(stmts) == 2
    assert stmts[0].startswith("DELETE FROM t WHERE doc_id IN")
    assert stmts[1].startswith("INSERT INTO t (doc_id, v) VALUES")


def _winners(ops, ids):
    n = len(ops)
    return pa.table({
        "op": pa.array(np.array(ops, np.uint8)),
        "commit_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "doc_id": pa.array(ids),
        "tokens": pa.array([[1, 2]] * n, pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 2, np.int32)),
        "source": pa.array(["web"] * n),
        "new_doc_id": pa.nulls(n, pa.string()),
    })


def test_safe_mode_translates_all_live_ops_to_replace():
    t = _winners([3, 2, 1], ["a", "b", "c"])
    my = statements_for_winners(t, "t", ["tokens", "n_tok", "source"],
                                dialect="mysql", safe_mode=True)
    assert sum("REPLACE INTO" in s for s in my) >= 1
    assert not any(s.startswith("INSERT INTO") for s in my)
    assert any("DELETE FROM t WHERE doc_id IN ('c')" == s for s in my)
    off = statements_for_winners(t, "t", ["tokens", "n_tok", "source"],
                                 dialect="mysql", safe_mode=False)
    assert any(s.startswith("INSERT INTO") for s in off)   # pure insert stays


def test_statements_apply_idempotently_on_duckdb():
    """Re-applying the full statement list is a no-op (safe-mode contract:
    REPLACE-natured DML + delete-missing-ok)."""
    t = _winners([3, 2, 1], ["a", "b", "c"])
    stmts = statements_for_winners(t, "t", ["tokens", "n_tok", "source"])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR PRIMARY KEY, tokens INTEGER[],"
                " n_tok INTEGER, source VARCHAR)")
    con.execute("INSERT INTO t VALUES ('c', [9], 1, 'old'), ('b', [8], 1, 'old')")
    for _ in range(2):                       # apply twice — same state
        for s in stmts:
            con.execute(s)
    out = con.execute("SELECT doc_id, n_tok, source FROM t ORDER BY doc_id").fetchall()
    assert out == [("a", 2, "web"), ("b", 2, "web")]


def test_sync_diff_repair_roundtrip():
    """T10 closed end-to-end: diff two tables, emit fix-SQL (the
    sync-diff-inspector --fix analog), apply it to the target, re-diff →
    equal. Covers all three mismatch classes (missing row, extra row,
    value drift) incl. list columns."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tiflow_ray.functions.diff import diff_tables, repair_sql

    n = 500
    left_t = pa.table({
        "doc_id": pa.array([f"doc-{i:06d}" for i in range(n)]),
        "tokens": pa.array([[i, i + 1] for i in range(n)], pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 2, np.int32)),
        "source": pa.array(["web"] * n),
    })
    # target drifts: row 7 missing, row 11 value-drifted, one alien row
    right_t = left_t.filter(
        pa.array([i != 7 for i in range(n)]))
    df = right_t.to_pandas()
    df.loc[df["doc_id"] == "doc-000011", "n_tok"] = 99
    df.loc[len(df)] = {"doc_id": "zzz-alien", "tokens": [0], "n_tok": 1,
                       "source": "noise"}
    right_t = pa.Table.from_pandas(df, schema=left_t.schema,
                                   preserve_index=False)

    left = ray.data.from_arrow(left_t)
    d = diff_tables(left, ray.data.from_arrow(right_t), "doc_id")
    assert not d["equal"]
    assert d["left_only"] == ["doc-000007"]
    assert d["right_only"] == ["zzz-alien"]
    assert d["value_diff"] == ["doc-000011"]

    stmts = repair_sql(left, d, "doc_id", "target")
    con = duckdb.connect()
    con.execute("CREATE TABLE target (doc_id VARCHAR PRIMARY KEY, "
                "tokens INTEGER[], n_tok INTEGER, source VARCHAR)")
    con.register("right_arrow", right_t)
    con.execute("INSERT INTO target SELECT * FROM right_arrow")
    for s in stmts:
        con.execute(s)
    fixed = con.execute("SELECT * FROM target ORDER BY doc_id").arrow() \
        .cast(left_t.schema)
    d2 = diff_tables(left, ray.data.from_arrow(fixed), "doc_id")
    assert d2["equal"], d2
    # the fix file is idempotent (safe-mode statements): reapply, still equal
    for s in stmts:
        con.execute(s)
    fixed2 = con.execute("SELECT * FROM target ORDER BY doc_id").arrow() \
        .cast(left_t.schema)
    assert diff_tables(left, ray.data.from_arrow(fixed2), "doc_id")["equal"]
