"""Declarative per-table SQL expression filter (M6 proper): the analog of
the reference's DML expression filter (pkg/filter/expr_filter.go:38-60 rule
shape, shouldSkipDML:~200-260 evaluation semantics), re-expressed as a
vectorized per-batch DuckDB evaluation instead of a per-row TiDB
expression interpreter.

Rule shape mirrors config.EventFilterRule: a table matcher plus four
optional IGNORE expressions —

- ignore_insert        evaluated on the NEW image of inserts
- ignore_update_old    evaluated on the PRE image of updates
- ignore_update_new    evaluated on the NEW image of updates
- ignore_delete        evaluated on the PRE image of deletes

An event is skipped when ANY matching rule's relevant expression(s) are
true; for updates the reference ORs the old- and new-image verdicts
(shouldSkipDML: `ignoreOld || ignoreNew`). NULL/unparseable truth values
coalesce to FALSE (keep) — exactly the reference's "expression false or
row lacks the column ⇒ not skipped".

PRE-image fidelity: this engine's WAL carries the pre image only for the
columns listed in `pre_map` (e.g. tokens ← pre_tokens); other image
columns appear as NULL in the pre view, so a pre-image expression over an
uncarried column never skips (COALESCE FALSE). Deletes carry key columns
only — same rule. This is a documented narrowing, not a silent one.

Evaluation is ONE DuckDB scan per (rule, expression) over the whole Arrow
batch — vectorized C++, zero-copy via duckdb's Arrow registration; the
connection is created lazily per worker process (never pickled).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..model import OP_DELETE, OP_INSERT, OP_UPDATE


@dataclass(frozen=True)
class ExprFilterRule:
    """One matcher × four optional ignore-expressions (EventFilterRule
    analog). Expressions are ANSI-SQL boolean predicates over the image
    columns, e.g. ``n_tok > 512 AND source = 'web'``."""
    matcher: str = ".*"                    # anchored regex over table name
    ignore_insert: str | None = None       # NEW image
    ignore_update_old: str | None = None   # PRE image
    ignore_update_new: str | None = None   # NEW image
    ignore_delete: str | None = None       # PRE image


#: event-frame columns that pass through both images unchanged
DEFAULT_KEY_COLS = ("op", "commit_ts", "start_ts", "doc_id", "new_doc_id",
                    "schema_ver")


class ExprFilter:
    """event_predicate-compatible callable: pa.Table → boolean keep mask.

    `pre_map` maps new-image column → the event column carrying its pre
    image (engine default: tokens ← pre_tokens). The pre view renames
    those, passes key columns through, and NULLs every other image column
    (typed, so any expression still binds)."""

    def __init__(self, rules: list[ExprFilterRule], table: str = "documents",
                 pre_map: dict[str, str] | None = None,
                 key_cols: tuple[str, ...] = DEFAULT_KEY_COLS):
        self.rules = [r for r in rules if re.fullmatch(r.matcher, table)]
        self.pre_map = dict(pre_map or {"tokens": "pre_tokens"})
        self.key_cols = tuple(key_cols)
        self._con = None               # lazy per-process (not picklable)

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_con"] = None
        return d

    def _duck(self):
        if self._con is None:
            import duckdb
            self._con = duckdb.connect()
        return self._con

    def _pre_view_sql(self, t: pa.Table) -> str:
        """SELECT list building the typed PRE image from the event frame."""
        sel = []
        pre_sources = set(self.pre_map.values())
        for name in t.column_names:
            if name in pre_sources:
                continue                       # exposed under its new name
            if name in self.pre_map:
                sel.append(f'"{self.pre_map[name]}" AS "{name}"')
            elif name in self.key_cols:
                sel.append(f'"{name}"')
            else:                              # pre image not carried
                sel.append(f'CAST(NULL AS {_duck_type(t.schema.field(name).type)})'
                           f' AS "{name}"')
        return "SELECT " + ", ".join(sel) + " FROM __batch"

    def _eval(self, expr: str, view_sql: str, n: int) -> np.ndarray:
        out = self._duck().execute(
            f"SELECT COALESCE(({expr}), FALSE) AS m FROM ({view_sql})"
        ).fetchnumpy()["m"]
        m = np.asarray(out, dtype=bool) if not np.ma.isMaskedArray(out) \
            else np.asarray(out.filled(False), dtype=bool)
        assert len(m) == n, "expression must be row-scalar (no aggregates)"
        return m

    def __call__(self, t: pa.Table) -> pa.Array:
        n = t.num_rows
        if not self.rules or n == 0:
            return pa.array(np.ones(n, bool))
        con = self._duck()
        con.register("__batch", t)
        new_view = "SELECT * FROM __batch"
        pre_view = self._pre_view_sql(t)
        op = t["op"].to_numpy(zero_copy_only=False)
        skip = np.zeros(n, bool)
        for r in self.rules:
            if r.ignore_insert:
                skip |= (op == OP_INSERT) & self._eval(r.ignore_insert,
                                                       new_view, n)
            if r.ignore_update_old:
                skip |= (op == OP_UPDATE) & self._eval(r.ignore_update_old,
                                                       pre_view, n)
            if r.ignore_update_new:
                skip |= (op == OP_UPDATE) & self._eval(r.ignore_update_new,
                                                       new_view, n)
            if r.ignore_delete:
                skip |= (op == OP_DELETE) & self._eval(r.ignore_delete,
                                                       pre_view, n)
        con.unregister("__batch")
        return pa.array(~skip)


def _duck_type(t: pa.DataType) -> str:
    """Arrow type → DuckDB type name for the NULL placeholders."""
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _duck_type(t.value_type) + "[]"
    if pa.types.is_integer(t):
        return "BIGINT"
    if pa.types.is_floating(t):
        return "DOUBLE"
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    if pa.types.is_decimal(t):
        return f"DECIMAL({t.precision},{t.scale})"
    return "VARCHAR"
