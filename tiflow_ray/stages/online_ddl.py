"""Online-DDL (gh-ost / pt-osc) shadow-table handling — the analog of
DM's online plugin (dm/syncer/online-ddl-tools/online_ddl.go:44-71
OnlinePlugin, 394-523 RealOnlinePlugin).

An online schema migration never ALTERs the real table. gh-ost creates a
ghost table `_tbl_gho`, applies the ALTER there, row-copies, then swaps
with `RENAME TABLE tbl TO _tbl_del, _tbl_gho TO tbl`; pt-osc is the same
dance with `_tbl_new` / `_tbl_old`. A replication engine must therefore:

* classify every table name as real / ghost / trash
  (online_ddl.go:499-513 TableType, default rules
  dm/config/subtask.go:59-60),
* drop ALL DML on ghost and trash tables (the row-copy and changelog
  traffic — it would double-apply the data),
* swallow DDL on ghost tables but RECORD the alters
  (online_ddl.go:481-523 Apply, GhostTable branch: Save on default),
* on `RENAME ghost -> real`, replay the recorded alters rewritten onto
  the real table at that barrier (Apply: renameOnlineDDLTable), and
* reject the nonsense renames the reference rejects (real->ghost,
  ghost->ghost, trash->ghost).

DML classification is vectorized over the DISTINCT table names of a
batch (regexes run once per name, never per row) — safe inside
map_batches on a 100 TB stream. DDL statements are control-plane scale
(per migration, not per row) and are processed on the driver, exactly as
the reference's syncer does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

# dm/config/subtask.go:59-60
DEFAULT_SHADOW_RULES = (r"^_(.+)_(?:new|gho)$",)
DEFAULT_TRASH_RULES = (r"^_(.+)_(?:ghc|del|old)$",)

REAL, GHOST, TRASH = "real", "ghost", "trash"


@dataclass(frozen=True)
class TableStmt:
    """One parsed DDL statement from the binlog stream.

    `kind`: "alter" | "create_table" | "drop_table" | "rename_table".
    For alter, `payload` carries the logical DDL body as
    (ddl_type, column, default) in the engine's own DDL vocabulary
    (stages/schema_evo.py DDL) — the stand-in for the SQL text the
    reference stores verbatim (GhostDDLInfo.DDLs)."""
    kind: str
    schema: str
    table: str
    barrier_ts: int
    to_table: str | None = None          # rename_table target
    payload: tuple | None = None         # alter body

    def __post_init__(self):
        assert self.kind in ("alter", "create_table", "drop_table",
                             "rename_table"), self.kind
        if self.kind == "rename_table":
            assert self.to_table, "rename_table needs to_table"


class OnlineDDLPlugin:
    """RealOnlinePlugin re-expression (online_ddl.go:394-523): one
    instance per changefeed; `storage` is the in-memory analog of the
    reference's checkpoint table (schema -> ghost table -> recorded
    alters)."""

    def __init__(self, shadow_rules=DEFAULT_SHADOW_RULES,
                 trash_rules=DEFAULT_TRASH_RULES):
        self.shadow = [re.compile(r) for r in shadow_rules]
        self.trash = [re.compile(r) for r in trash_rules]
        self.storage: dict[tuple[str, str], list[tuple]] = {}

    # -- classification (online_ddl.go:499-513 / 515-529) -------------
    def table_type(self, table: str) -> str:
        for r in self.shadow:
            if r.search(table):
                return GHOST
        for r in self.trash:
            if r.search(table):
                return TRASH
        return REAL

    def real_name(self, table: str) -> str:
        for r in self.shadow + self.trash:
            m = r.search(table)
            if m and m.lastindex:
                return m.group(1)
        return table

    # -- DDL processing (online_ddl.go:442-523 Apply) ------------------
    def apply(self, stmt: TableStmt) -> list[TableStmt]:
        """Returns the statements to run downstream (possibly rewritten),
        or [] when the statement is swallowed. Raises ValueError on the
        rename shapes the reference rejects."""
        tp = self.table_type(stmt.table)
        key = (stmt.schema, stmt.table)
        if tp == REAL:
            if stmt.kind == "rename_table":
                tp1 = self.table_type(stmt.to_table)
                if tp1 == TRASH:        # real -> trash: the swap's 1st leg
                    return []
                if tp1 == GHOST:
                    raise ValueError(
                        f"rename real table to ghost table: {stmt}")
            return [stmt]
        if tp == TRASH:
            if stmt.kind == "rename_table" and \
                    self.table_type(stmt.to_table) == GHOST:
                raise ValueError(f"rename trash table to ghost: {stmt}")
            return []                   # ignore TrashTable
        # GhostTable
        if stmt.kind in ("create_table", "drop_table"):
            self.storage.pop(key, None)   # migration (re)starts / aborts
            return []
        if stmt.kind == "rename_table":
            tp1 = self.table_type(stmt.to_table)
            if tp1 == REAL:             # the swap's 2nd leg: fold DDLs out
                recorded = self.storage.pop(key, None)
                if recorded is None:
                    raise ValueError(
                        f"online ddl rename on ghost table with no "
                        f"recorded ddl: {stmt.schema}.{stmt.table}")
                return [TableStmt("alter", stmt.schema, stmt.to_table,
                                  stmt.barrier_ts, payload=p)
                        for p in recorded]
            if tp1 == GHOST:
                raise ValueError(f"rename ghost table to ghost: {stmt}")
            self.storage.pop(key, None)  # ghost -> trash
            return []
        # alter on the ghost table: record, don't apply
        self.storage.setdefault(key, []).append(stmt.payload)
        return []

    def finish(self, schema: str, table: str) -> None:
        self.storage.pop((schema, table), None)

    # -- vectorized DML masking ----------------------------------------
    def types_of(self, tables: np.ndarray) -> np.ndarray:
        """Table type per element, computed once per DISTINCT name."""
        uniq, inv = np.unique(tables.astype(str), return_inverse=True)
        per = np.array([self.table_type(t) for t in uniq], dtype=object)
        return per[inv]

    def dml_mask(self, t: pa.Table, table_col: str = "table_name") -> pa.Array:
        """Keep-mask for a DML batch: True only for real-table rows —
        ghost row-copy and changelog traffic must never reach the sink.
        A batch without the routing column is all-real (single-table
        sources that never saw a migration)."""
        if table_col not in t.column_names:
            return pa.array(np.ones(t.num_rows, dtype=bool))
        tables = np.asarray(t[table_col].to_numpy(zero_copy_only=False))
        return pa.array(self.types_of(tables) == REAL)


def registry_from_binlog(stmts: list[TableStmt], real_table: str,
                         plugin: OnlineDDLPlugin | None = None):
    """Fold a DDL statement stream through the online plugin into the
    engine's SchemaRegistry: each surviving alter on `real_table` becomes
    one versioned DDL barrier (the syncer's trackedDDL -> schema tracker
    hand-off). Statements must arrive in barrier_ts order."""
    from .schema_evo import DDL, SchemaRegistry

    plugin = plugin or OnlineDDLPlugin()
    out, ver = [], 1
    last = None
    for s in stmts:
        assert last is None or s.barrier_ts >= last, \
            "DDL statements must be barrier_ts-ordered"
        last = s.barrier_ts
        for em in plugin.apply(s):
            if em.kind == "alter" and em.table == real_table:
                ddl_type, column, default = em.payload
                ver += 1
                out.append(DDL(em.barrier_ts, ddl_type, column,
                               default, ver))
    return SchemaRegistry(out)
