"""Schema registry / barrier semantics (SURVEY.md §7 known-hard #2)."""

import pyarrow as pa

from tiflow_ray.stages.schema_evo import DDL, SchemaRegistry


def reg():
    return SchemaRegistry([
        DDL(100, "add_column", "lang:string", "und", 2),
        DDL(200, "drop_column", "source", None, 3),
    ])


def test_version_at_barrier_uses_old_schema():
    r = reg()
    assert r.version_at(99) == 1
    assert r.version_at(100) == 1   # AT the barrier → OLD schema
    assert r.version_at(101) == 2
    assert r.version_at(200) == 2
    assert r.version_at(201) == 3


def test_schema_chain():
    r = reg()
    assert r.schema(1).names == ["doc_id", "tokens", "n_tok", "source"]
    assert r.schema(2).names == ["doc_id", "tokens", "n_tok", "source", "lang"]
    assert r.schema(3).names == ["doc_id", "tokens", "n_tok", "lang"]
    assert r.defaults(2) == {"lang": "und"}


def test_cast_add_backfills_default_and_drop_removes():
    r = reg()
    t = pa.table({"doc_id": ["a"], "tokens": pa.array([[1, 2]], pa.list_(pa.int32())),
                  "n_tok": pa.array([2], pa.int32()), "source": ["web"]})
    t2 = r.cast_table(t, 1, 2)
    assert t2["lang"].to_pylist() == ["und"]
    t3 = r.cast_table(t2, 2, 3)
    assert "source" not in t3.column_names
    assert t3.schema == r.schema(3)
    # direct 1→3 jump
    t13 = r.cast_table(t, 1, 3)
    assert t13.equals(t3)


def test_json_roundtrip():
    r = reg()
    r2 = SchemaRegistry.from_json(r.to_json())
    assert r2.barriers() == r.barriers()
    assert r2.schema(3) == r.schema(3)
    assert r2.defaults(2) == r.defaults(2)
