"""Declarative binlog event filter matrix (M7): schema/table regex ×
event-kind rules, the analog of the reference's binlog filter
(pkg/binlog-filter/filter.go:1-436 — BinlogEventRule with SchemaPattern /
TablePattern / Events / Action Do|Ignore).

Semantics mirrored (filter.go Filter, lines 324-391): rules whose schema
AND table regexes full-match are walked in order; an Ignore rule whose
event set contains the kind short-circuits to drop (Ignore has highest
priority — a later Do cannot resurrect it), and a Do rule whose event set
does NOT contain the kind also drops (a Do rule is an event whitelist for
the tables it matches); any other matched rule falls through. An event no
schema/table rule matches — or that survives every matched rule — is kept.
Patterns are anchored full-matches, case-insensitive by default (the
reference lower-cases unless case-sensitive is set).

The mask is vectorized over the DISTINCT (schema, table) pairs of a batch —
the rule regexes run once per pair, never per row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..model import OP_DELETE, OP_INSERT, OP_UPDATE

EVENT_KINDS = ("insert", "update", "delete")
_OP_KIND = {OP_INSERT: "insert", OP_UPDATE: "update", OP_DELETE: "delete"}


@dataclass(frozen=True)
class FilterRule:
    schema_pattern: str                # anchored regex over schema name
    table_pattern: str                 # anchored regex over table name
    events: tuple[str, ...] = ("all",)  # subset of EVENT_KINDS or ("all",)
    action: str = "Ignore"             # "Do" keeps, "Ignore" drops

    def __post_init__(self):
        assert self.action in ("Do", "Ignore"), self.action
        for e in self.events:
            assert e == "all" or e in EVENT_KINDS, e


class BinlogFilter:
    def __init__(self, rules: list[FilterRule], case_sensitive: bool = False):
        flags = 0 if case_sensitive else re.IGNORECASE
        self.rules = [(re.compile(r.schema_pattern, flags),
                       re.compile(r.table_pattern, flags),
                       frozenset(EVENT_KINDS if "all" in r.events else r.events),
                       r.action == "Do", )
                      for r in rules]

    def keep(self, schema: str, table: str, kind: str) -> bool:
        """Reference priority walk: first matching Ignore drops; a Do rule
        whose event list excludes the kind drops (whitelist); default keep."""
        for s_re, t_re, kinds, is_do in self.rules:
            if not (s_re.fullmatch(schema) and t_re.fullmatch(table)):
                continue
            if kind in kinds:
                if not is_do:          # Ignore has highest priority
                    return False
            elif is_do:                # Do whitelist excludes this kind
                return False
        return True

    def mask(self, schemas: np.ndarray, tables: np.ndarray,
             ops: np.ndarray) -> np.ndarray:
        """Vectorized keep-mask: regexes evaluate once per distinct
        (schema, table, kind) triple, then broadcast by inverse index."""
        SEP = "\x1f"   # numpy U-strings silently truncate at NUL — use US
        op_kind = np.empty(len(ops), dtype=object)
        for o in np.unique(ops):
            op_kind[ops == o] = _OP_KIND[int(o)]
        key = np.char.add(np.char.add(schemas.astype(str), SEP),
                          np.char.add(tables.astype(str), SEP))
        key = np.char.add(key, op_kind.astype(str))
        uniq, inv = np.unique(key, return_inverse=True)
        verdicts = np.empty(len(uniq), bool)
        for i, k in enumerate(uniq):
            s, t, e = k.split(SEP)
            verdicts[i] = self.keep(s, t, e)
        return verdicts[inv]

    def batch_mask(self, t: pa.Table, schema_col: str = "schema",
                   table_col: str = "table", op_col: str = "op") -> pa.Array:
        return pa.array(self.mask(
            np.asarray(t[schema_col].to_numpy(zero_copy_only=False)),
            np.asarray(t[table_col].to_numpy(zero_copy_only=False)),
            t[op_col].to_numpy(zero_copy_only=False)))
