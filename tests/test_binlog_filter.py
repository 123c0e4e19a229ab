"""Declarative binlog filter matrix (pkg/binlog-filter semantics:
filter.go Filter:324-391 — first matching Ignore short-circuits, a Do
rule acts as an event whitelist for the tables it matches)."""

import numpy as np

from tiflow_ray.stages.binlog_filter import BinlogFilter, FilterRule


def test_ignore_priority_and_do_whitelist():
    f = BinlogFilter([
        FilterRule("db.*", "click|view", ("update",), "Ignore"),
        FilterRule("db1", "click", ("all",), "Do"),
    ])
    # Ignore has highest priority: the later Do cannot resurrect it.
    assert not f.keep("db1", "click", "update")
    assert not f.keep("db0", "click", "update")    # rule 1 drops
    assert f.keep("db0", "click", "insert")        # kind-scoped: not update
    assert f.keep("db1", "click", "insert")        # in rule 2's all-whitelist
    assert f.keep("other", "orders", "delete")     # no rule matches → keep


def test_do_rule_is_event_whitelist():
    f = BinlogFilter([FilterRule("db1", "click", ("insert",), "Do")])
    assert f.keep("db1", "click", "insert")
    # Matched table but kind outside the Do rule's event list → Ignore.
    assert not f.keep("db1", "click", "update")
    assert not f.keep("db1", "click", "delete")
    assert f.keep("db1", "view", "update")         # table unmatched → keep


def test_patterns_are_anchored_and_case_insensitive():
    f = BinlogFilter([FilterRule("prod", "users", ("all",), "Ignore")])
    assert not f.keep("PROD", "Users", "insert")   # case-insensitive default
    assert f.keep("prod2", "users", "insert")      # full-match: no prefix hit
    strict = BinlogFilter([FilterRule("prod", "users", ("all",), "Ignore")],
                          case_sensitive=True)
    assert strict.keep("PROD", "users", "insert")


def test_vectorized_mask_matches_scalar_keep():
    f = BinlogFilter([
        FilterRule("db0", "t[0-9]", ("delete",), "Ignore"),
        FilterRule("db.*", "t1", ("insert", "update"), "Do"),
    ])
    rng = np.random.default_rng(3)
    schemas = np.array(["db0", "db1"])[rng.integers(0, 2, 200)]
    tables = np.array(["t0", "t1", "tx"])[rng.integers(0, 3, 200)]
    ops = rng.integers(1, 4, 200).astype(np.uint8)
    got = f.mask(schemas, tables, ops)
    kind = {1: "delete", 2: "update", 3: "insert"}
    exp = np.array([f.keep(s, t, kind[int(o)])
                    for s, t, o in zip(schemas, tables, ops)])
    assert (got == exp).all()
