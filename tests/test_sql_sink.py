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
