"""Batched-SQL transactional sink (K3 made real): compacted per-partition
winners → multi-value DML statements, the analog of the reference's MySQL
txn sink.

Semantics mirrored (not code):
- multi-value batching: one REPLACE/DELETE statement carries up to
  `max_rows` rows (pkg/sqlmodel/multirow.go:1-308 — GenInsert/GenDelete
  with joined VALUES groups; dm/docs/RFCS/20211008_dml_execution_optimization.md
  measured ~5x from multi-value batching).
- safe-mode translation: INSERT/UPDATE both become REPLACE (idempotent
  upsert) so re-applying an applied prefix is a no-op
  (cdc/sink/dmlsink/txn/mysql/mysql.go:525-608 batchSingleTxnDmls +
  safe-mode REPLACE path; DM safe mode §2.9).
- deletes batch into `DELETE ... WHERE key IN (...)`
  (pkg/sqlmodel/multirow.go GenDelete analog).
- per-key ordering: the input is the COMPACTED winner set (exactly one
  event per key, stages/compact.py), so statements within a partition
  commute across keys; deletes are emitted before upserts only for
  determinism of the statement list.

Dialects: "duckdb" (INSERT OR REPLACE, native INTEGER[] list literals —
what the tests execute) and "mysql" (REPLACE INTO, token arrays rendered as
JSON text since MySQL has no array type). No live DB connection here — the
sandbox has no MySQL; the statement generator IS the sink contract and is
executed against DuckDB in tests/queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..model import OP_DELETE


def _quote_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def render_literal(v, dialect: str = "duckdb") -> str:
    """One SQL literal. Lists render as native array literals (duckdb) or
    JSON text (mysql); None → NULL."""
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        inner = ", ".join("NULL" if x is None else str(int(x)) for x in v)
        if dialect == "duckdb":
            return f"[{inner}]"
        return _quote_str(f"[{inner}]")          # mysql: JSON-ish text
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'" if dialect == "mysql" \
            else "'\\x" + bytes(v).hex() + "'::BLOB"
    return _quote_str(str(v))


def gen_upserts(table: str, cols: list[str], rows: list[tuple],
                dialect: str = "duckdb", max_rows: int = 64,
                key_col: str = "doc_id") -> list[str]:
    """Multi-value REPLACE statements, ≤ max_rows rows each. MySQL REPLACE
    is defined as delete-then-insert; the duckdb dialect emits exactly that
    pair per chunk (DuckDB's INSERT OR REPLACE cannot update list columns),
    which keeps the idempotent-upsert contract identical."""
    out = []
    key_idx = cols.index(key_col)
    for i in range(0, len(rows), max_rows):
        chunk = rows[i:i + max_rows]
        groups = ["(" + ", ".join(render_literal(v, dialect) for v in r) + ")"
                  for r in chunk]
        values = ", ".join(groups)
        collist = ", ".join(cols)
        if dialect == "mysql":
            out.append(f"REPLACE INTO {table} ({collist}) VALUES {values}")
        else:
            out += gen_deletes(table, key_col, [r[key_idx] for r in chunk],
                               dialect, max_rows)
            out.append(f"INSERT INTO {table} ({collist}) VALUES {values}")
    return out


def gen_deletes(table: str, key_col: str, keys: list, dialect: str = "duckdb",
                max_rows: int = 64) -> list[str]:
    """Multi-value DELETE ... WHERE key IN (...) statements."""
    out = []
    for i in range(0, len(keys), max_rows):
        vals = ", ".join(render_literal(k, dialect) for k in keys[i:i + max_rows])
        out.append(f"DELETE FROM {table} WHERE {key_col} IN ({vals})")
    return out


def statements_for_winners(t: pa.Table, table: str, image_cols: list[str],
                           dialect: str = "duckdb", safe_mode: bool = True,
                           max_rows: int = 64) -> list[str]:
    """Compacted winner events (one per key) → ordered statement list for
    one partition. safe_mode=True (default, the reference's replication
    posture): every non-delete becomes an idempotent REPLACE. With
    safe_mode=False, inserts stay INSERT (fails loudly on unexpected
    duplicates — the reference's post-catch-up optimization)."""
    if t.num_rows == 0:
        return []
    op = t["op"].to_numpy(zero_copy_only=False)
    is_del = op == OP_DELETE
    stmts: list[str] = []
    keys = t["doc_id"].to_pylist()
    del_keys = [k for k, d in zip(keys, is_del) if d]
    stmts += gen_deletes(table, "doc_id", del_keys, dialect, max_rows)

    cols = ["doc_id"] + list(image_cols)
    live = t.filter(pa.array(~is_del))
    live_rows = list(zip(*[live[c].to_pylist() for c in cols])) \
        if live.num_rows else []
    if safe_mode:
        stmts += gen_upserts(table, cols, live_rows, dialect, max_rows)
    else:
        from ..model import OP_INSERT
        live_op = op[~is_del]
        ins = [r for r, o in zip(live_rows, live_op) if o == OP_INSERT]
        upd = [r for r, o in zip(live_rows, live_op) if o != OP_INSERT]
        if ins:
            head = f"INSERT INTO {table} ({', '.join(cols)}) VALUES "
            for i in range(0, len(ins), max_rows):
                groups = ["(" + ", ".join(render_literal(v, dialect) for v in r) + ")"
                          for r in ins[i:i + max_rows]]
                stmts.append(head + ", ".join(groups))
        # updates keep REPLACE even outside safe mode: with a compacted
        # winner per key, REPLACE ≡ UPDATE-or-INSERT and stays idempotent
        stmts += gen_upserts(table, cols, upd, dialect, max_rows)
    return stmts


class SqlSinkStage:
    """map_groups callable for `groupby("part")`: one partition's compacted
    events → (part, seq, stmt) rows. The statement stream per partition is
    the unit a downstream DML worker would apply in one transaction
    (dml_worker per-partition ordering analog)."""

    def __init__(self, table: str, image_cols: list[str],
                 dialect: str = "duckdb", safe_mode: bool = True,
                 max_rows: int = 64):
        self.table, self.image_cols = table, list(image_cols)
        self.dialect, self.safe_mode, self.max_rows = dialect, safe_mode, max_rows

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stages.compact import compact_partition
        part = int(t["part"][0].as_py()) if t.num_rows else -1
        w = compact_partition(t.drop_columns(["part"]))
        stmts = statements_for_winners(w, self.table, self.image_cols,
                                       self.dialect, self.safe_mode,
                                       self.max_rows)
        return pa.table({
            "part": pa.array(np.full(len(stmts), part, np.int32)),
            "seq": pa.array(np.arange(len(stmts), dtype=np.int32)),
            "stmt": pa.array(stmts, pa.string()),
        })
