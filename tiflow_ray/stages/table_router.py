"""Table router with extend-column extraction — DM's route-rules surface
(dm/config/task.go:146 RouteRules; applied in dm/syncer/syncer.go:2797-2820
generateExtendColumn via table-router FetchExtendColumn).

A route rule matches upstream (schema, table) by wildcard pattern (the
table-filter language) and rewrites them to a target schema/table — the
shard-merge fan-in. Its optional extractors materialize the PROVENANCE a
fan-in destroys, as real columns on every routed row:

* extract-table:  capture groups of `table-regexp` over the source table
  name, joined, into `target-column` (e.g. table `t_1` → shard index "1");
* extract-schema: same over the source schema name;
* extract-source: same over the source-id string (which upstream replica).

Reference behavior mirrored: first matching rule wins per (schema, table);
unmatched tables keep their names and gain no columns; an extractor whose
regexp does not match contributes an empty string (table-router joins
submatches [1:], no-match ⇒ no value).

Batch application resolves routing once per DISTINCT (schema, table) pair
and appends group-constant columns by inverse index — no per-row Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .table_filter import _compile_part


@dataclass(frozen=True)
class Extractor:
    regexp: str
    target_column: str

    def value(self, name: str) -> str:
        m = re.search(self.regexp, name)
        if not m:
            return ""
        return "".join(g or "" for g in m.groups())


@dataclass(frozen=True)
class RouteRule:
    schema_pattern: str
    table_pattern: str = "*"
    target_schema: str | None = None   # None = keep source name
    target_table: str | None = None
    extract_table: Extractor | None = None
    extract_schema: Extractor | None = None
    extract_source: Extractor | None = None


class TableRouter:
    def __init__(self, rules: list[RouteRule], case_sensitive: bool = False):
        flags = 0 if case_sensitive else re.IGNORECASE
        self.rules = [(_compile_part(r.schema_pattern, flags),
                       _compile_part(r.table_pattern, flags), r)
                      for r in rules]

    def _match(self, schema: str, table: str) -> RouteRule | None:
        for s_fn, t_fn, rule in self.rules:
            if s_fn(schema) and t_fn(table):
                return rule
        return None

    def route(self, schema: str, table: str) -> tuple[str, str]:
        rule = self._match(schema, table)
        if rule is None:
            return schema, table
        return (rule.target_schema or schema, rule.target_table or table)

    def fetch_extend_column(self, schema: str, table: str,
                            source_id: str) -> tuple[list[str], list[str]]:
        """(columns, values) the routed rows must carry —
        FetchExtendColumn analog."""
        rule = self._match(schema, table)
        if rule is None:
            return [], []
        cols, vals = [], []
        for ex, name in ((rule.extract_table, table),
                         (rule.extract_schema, schema),
                         (rule.extract_source, source_id)):
            if ex is not None:
                cols.append(ex.target_column)
                vals.append(ex.value(name))
        return cols, vals

    def route_batch(self, t: pa.Table, source_id: str,
                    schema_col: str = "schema_name",
                    table_col: str = "table_name") -> pa.Table:
        """Rewrite schema/table columns to their targets and append every
        extend column any matching rule defines (rows whose rule lacks a
        given column carry null there, so the batch schema stays uniform)."""
        SEP = "\x1f"
        schemas = np.asarray(t[schema_col].to_numpy(zero_copy_only=False))
        tables = np.asarray(t[table_col].to_numpy(zero_copy_only=False))
        pairs = np.char.add(np.char.add(schemas.astype(str), SEP),
                            tables.astype(str))
        uniq, inv = np.unique(pairs, return_inverse=True)
        tgt_s = np.empty(len(uniq), object)
        tgt_t = np.empty(len(uniq), object)
        ext: dict[str, np.ndarray] = {}
        for i, u in enumerate(uniq):
            s, tb = u.split(SEP, 1)
            tgt_s[i], tgt_t[i] = self.route(s, tb)
            cols, vals = self.fetch_extend_column(s, tb, source_id)
            for c, v in zip(cols, vals):
                if c not in ext:
                    ext[c] = np.full(len(uniq), None, object)
                ext[c][i] = v
        t = t.set_column(t.column_names.index(schema_col), schema_col,
                         pa.array(tgt_s[inv], pa.string()))
        t = t.set_column(t.column_names.index(table_col), table_col,
                         pa.array(tgt_t[inv], pa.string()))
        for c in sorted(ext):
            t = t.append_column(c, pa.array(ext[c][inv], pa.string()))
        return t
