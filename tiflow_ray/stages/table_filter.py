"""Table filter — the `rules = ['*.*', '!test.*']` pattern language every
changefeed/task config starts with (the reference filters via TiDB's
table-filter util: pkg/filter/filter.go:18 + utils.go, semantics published
in the tidb-tools table-filter README).

Semantics implemented:

* a rule is `schema_pattern.table_pattern` (a bare `schema_pattern`
  matches every table in the schema);
* wildcards inside a pattern: `*` (any run), `?` (one char), `[a-z]` /
  `[!a-z]` character classes; a pattern starting with `~` is a raw
  regular expression (unanchored, Go MatchString-style);
* a rule starting with `!` is an exclusion;
* rules are evaluated in order and the LAST matching rule wins;
* a table matching no rule is excluded (so the universal accept is the
  explicit `['*.*']` every default config carries);
* matching is case-insensitive unless case_sensitive is set
  (filter.CaseInsensitive wrapping in event_router.go:66-68).

Masks are vectorized over the DISTINCT (schema, table) pairs of a batch —
patterns run once per pair, never per row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def _wildcard_to_regex(pat: str) -> str:
    """Translate one table-filter wildcard pattern into an anchored regex."""
    out, i, n = [], 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            neg = j < n and pat[j] == "!"
            if neg:
                j += 1
            k = pat.find("]", j + 1)   # first ] may be a literal member
            if k == -1:
                out.append(re.escape(c))
            else:
                body = pat[i + 1 + (1 if neg else 0):k]
                out.append("[" + ("^" if neg else "")
                           + body.replace("\\", "\\\\") + "]")
                i = k
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)


def _compile_part(pat: str, flags: int):
    """Returns name -> bool. Wildcard patterns full-match; `~regex`
    patterns are unanchored (Go regexp.MatchString semantics)."""
    if pat.startswith("~"):
        return re.compile(pat[1:], flags).search
    return re.compile(_wildcard_to_regex(pat) + r"\Z", flags).match


class TableFilter:
    """Ordered accept/exclude rules over (schema, table) names."""

    def __init__(self, rules: list[str], case_sensitive: bool = False):
        flags = 0 if case_sensitive else re.IGNORECASE
        self.rules: list[tuple[bool, re.Pattern, re.Pattern]] = []
        for raw in rules:
            rule = raw.strip()
            if not rule or rule.startswith("#"):
                continue
            positive = not rule.startswith("!")
            if not positive:
                rule = rule[1:].strip()
            # split on the first dot OUTSIDE a [...] class / ~regex tail;
            # a ~regex schema part may itself contain dots, so the split
            # walks the string instead of str.split
            schema_pat, table_pat = self._split_rule(rule)
            self.rules.append((positive,
                               _compile_part(schema_pat, flags),
                               _compile_part(table_pat, flags)))

    @staticmethod
    def _split_rule(rule: str) -> tuple[str, str]:
        """Split schema/table on the first dot outside a [...] class. A
        `~regex` part must therefore not contain a literal dot — use \\x2e
        inside regex bodies that need one."""
        depth, i = 0, 0
        while i < len(rule):
            c = rule[i]
            if c == "[":
                depth += 1
            elif c == "]":
                depth = max(0, depth - 1)
            elif c == "." and depth == 0:
                return rule[:i], rule[i + 1:]
            i += 1
        return rule, "*"               # bare schema rule: every table

    def match(self, schema: str, table: str) -> bool:
        """Last matching rule wins; no match ⇒ excluded."""
        verdict = False
        for positive, s_fn, t_fn in self.rules:
            if s_fn(schema) and t_fn(table):
                verdict = positive
        return verdict

    def mask(self, schemas: np.ndarray, tables: np.ndarray) -> np.ndarray:
        """Vectorized keep-mask: rules run once per distinct pair."""
        SEP = "\x1f"
        pairs = np.char.add(np.char.add(schemas.astype(str), SEP),
                            tables.astype(str))
        uniq, inv = np.unique(pairs, return_inverse=True)
        per = np.fromiter(
            (self.match(*u.split(SEP, 1)) for u in uniq),
            dtype=bool, count=len(uniq))
        return per[inv]

    def batch_mask(self, t: pa.Table, schema_col: str = "schema_name",
                   table_col: str = "table_name") -> pa.Array:
        schemas = np.asarray(t[schema_col].to_numpy(zero_copy_only=False))
        tables = np.asarray(t[table_col].to_numpy(zero_copy_only=False))
        return pa.array(self.mask(schemas, tables))
