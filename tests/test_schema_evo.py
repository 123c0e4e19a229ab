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


def test_widened_type_lattice_defaults_and_casts():
    """DECIMAL/TIMESTAMP/BINARY/BOOL columns (table_definition.go:39-102
    type list): typed defaults parse, backfill, and JSON-roundtrip."""
    import decimal

    import numpy as np
    r = SchemaRegistry([
        DDL(10, "add_column", "price:decimal(18,6)", "1.500000", 2),
        DDL(20, "add_column", "created_at:timestamp_us",
            "2020-01-01T00:00:00", 3),
        DDL(30, "add_column", "payload:binary", "ff00", 4),
        DDL(40, "add_column", "flag:bool", "true", 5),
        DDL(50, "add_column", "seen_at:timestamp_us_tz",
            "2021-06-01T12:00:00", 6),
    ])
    assert r.schema(6).field("price").type == pa.decimal128(18, 6)
    assert r.schema(6).field("created_at").type == pa.timestamp("us")
    assert r.schema(6).field("seen_at").type == pa.timestamp("us", tz="UTC")
    assert r.schema(6).field("payload").type == pa.binary()
    t = pa.table({"doc_id": ["a"], "tokens": pa.array([[1]], pa.list_(pa.int32())),
                  "n_tok": pa.array([1], pa.int32()), "source": ["web"]})
    t6 = r.cast_table(t, 1, 6)
    assert t6["price"].to_pylist() == [decimal.Decimal("1.500000")]
    assert t6["created_at"].to_pylist()[0] == np.datetime64("2020-01-01", "us")
    assert t6["payload"].to_pylist() == [b"\xff\x00"]
    assert t6["flag"].to_pylist() == [True]
    r2 = SchemaRegistry.from_json(r.to_json())
    assert r2.schema(6) == r.schema(6)
    assert r2.defaults(6) == r.defaults(6)


def test_typed_replay_matches_duckdb_oracle():
    """cdc_replay_types end-to-end at sf0.001: decimal/timestamp/binary
    flow through WAL parquet, barrier-only epochs, merge casts, and the
    lake; final state equals the DuckDB window-function replay."""
    import duckdb

    from tiflow_ray.queries import _CDC_TYPED_SQL, q_cdc_replay_types
    sf = "/root/testdata/sf0.001"
    got = q_cdc_replay_types(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(_CDC_TYPED_SQL).df().sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].astype(str).values == want[c].astype(str).values).all(), c


def test_modify_column_widens_type_and_casts():
    r = SchemaRegistry([DDL(100, "modify_column", "n_tok:int64", None, 2)])
    assert r.schema(1).field("n_tok").type == pa.int32()
    assert r.schema(2).field("n_tok").type == pa.int64()
    t = pa.table({"doc_id": ["a"], "tokens": pa.array([[1]], pa.list_(pa.int32())),
                  "n_tok": pa.array([1], pa.int32()), "source": ["web"]})
    t2 = r.cast_table(t, 1, 2)
    assert t2["n_tok"].type == pa.int64()
    assert t2["n_tok"].to_pylist() == [1]
    r2 = SchemaRegistry.from_json(r.to_json())
    assert r2.schema(2) == r.schema(2)


def test_modify_column_replays_end_to_end(tmp_path):
    """n_tok widens int32→int64 at a mid-stream barrier; pre-barrier events
    (old type) and post-barrier events (new type) both land, and the final
    lake carries the widened schema."""
    import os

    import numpy as np

    from tiflow_ray import fixtures
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp

    root = str(tmp_path / "mod")
    os.makedirs(root)
    reg = SchemaRegistry([DDL(500, "modify_column", "n_tok:int64", None, 2)])
    n = 10
    dnum = np.arange(n, dtype=np.int64)
    base = pa.table({
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "tokens": pa.array([[0]] * n, pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(["web"] * n),
    })
    fixtures.write_base_partitioned(base, root, 4)
    # one pre-barrier update (docs 0-4) and one post-barrier (docs 5-9)
    cts = np.array([100 + i for i in range(5)] + [900 + i for i in range(5)])
    ver = np.where(cts <= 500, 1, 2).astype(np.int32)
    wal = pa.table({
        "op": pa.array(np.full(n, 2, np.uint8)),
        "commit_ts": pa.array(cts.astype(np.uint64)),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "tokens": pa.array([[7, 7]] * n, pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 2, np.int32)),
        "source": pa.array(["web"] * n),
        "pre_tokens": pa.nulls(n, pa.list_(pa.int32())),
        "new_doc_id": pa.nulls(n, pa.string()),
        "schema_ver": pa.array(ver),
    })
    fixtures.write_wal_segments(wal, os.path.join(root, "wal"), 2, reg)
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=os.path.join(root, "lake"), num_partitions=4)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    out = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert out["n_tok"].type == pa.int64()
    assert out.num_rows == n
    assert out["n_tok"].to_pylist() == [2] * n


def test_json_roundtrip():
    r = reg()
    r2 = SchemaRegistry.from_json(r.to_json())
    assert r2.barriers() == r.barriers()
    assert r2.schema(3) == r.schema(3)
    assert r2.defaults(2) == r.defaults(2)


def test_enum_set_json_lattice():
    """ENUM dict-encodes, SET is list<string>, JSON is a validated string
    passthrough; defaults are typed and membership-checked
    (table_definition.go:39-102 tail of the lattice)."""
    import pytest
    r = SchemaRegistry([
        DDL(10, "add_column", "cat:enum('a','b','c')", "b", 2),
        DDL(20, "add_column", "tags:set<string>", "x,y", 3),
        DDL(30, "add_column", "meta:json", '{"k":1}', 4),
    ])
    s = r.schema(4)
    assert pa.types.is_dictionary(s.field("cat").type)
    assert s.field("tags").type == pa.list_(pa.string())
    assert s.field("meta").type == pa.string()
    assert r.defaults(4) == {"cat": "b", "tags": ["x", "y"],
                             "meta": '{"k":1}'}
    # backfill casts the defaults onto a v1 table
    base = pa.table({"doc_id": pa.array(["d"]),
                     "tokens": pa.array([[1]], pa.list_(pa.int32())),
                     "n_tok": pa.array([1], pa.int32()),
                     "source": pa.array(["web"])})
    out = r.cast_table(base, 1, 4)
    assert out["cat"].to_pylist() == ["b"]
    assert pa.types.is_dictionary(out.schema.field("cat").type)
    assert out["tags"].to_pylist() == [["x", "y"]]
    assert out["meta"].to_pylist() == ['{"k":1}']
    # enum default outside the declared elements must refuse
    with pytest.raises(AssertionError, match="enum default"):
        SchemaRegistry([DDL(10, "add_column", "cat:enum('a','b')", "z", 2)])
    # declared-element set validates membership too
    with pytest.raises(AssertionError, match="set default"):
        SchemaRegistry([DDL(10, "add_column", "s:set('a','b')", "a,q", 2)])
    # json default must parse
    with pytest.raises(Exception):
        SchemaRegistry([DDL(10, "add_column", "m:json", "{broken", 2)])


def test_non_schema_ddls_are_noop_barriers_with_manifest_note(tmp_path):
    """add/drop index and exchange partition (metadata-only for a lake)
    are recognized, cut a barrier (version++), change no schema, and the
    committing manifest records a ddl_skipped note (r3 verdict #7)."""
    import os

    import numpy as np

    from tiflow_ray import fixtures, oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.state.checkpoint import LakeState

    r = SchemaRegistry([
        DDL(50, "add_index", "idx_doc", None, 2),
        DDL(90, "add_column", "lang:string", "en", 3),
        DDL(130, "exchange_partition", "p0", None, 4),
    ])
    assert r.schema(2) == r.schema(1)           # no-op on the schema
    assert r.schema(4) == r.schema(3)
    assert "lang" in r.schema(3).names

    root = str(tmp_path / "fx")
    os.makedirs(root)
    n = 40
    dnum = np.arange(n, dtype=np.int64)
    base = pa.table({
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "tokens": pa.array([[0]] * n, pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(["seed"] * n)})
    fixtures.write_base_partitioned(base, root, 4)
    cts = np.arange(10, 10 + 4 * n, 4, dtype=np.uint64)
    vers = np.array([r.version_at(int(t)) for t in cts], np.int32)
    ev = pa.table({
        "op": pa.array(np.full(n, 2, np.uint8)),
        "commit_ts": pa.array(cts),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "pre_tokens": pa.nulls(n, pa.list_(pa.int32())),
        "new_doc_id": pa.nulls(n, pa.string()),
        "tokens": pa.array([[int(d)] for d in dnum], pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(["web"] * n),
        "lang": pa.array([("fr" if v >= 3 else None) for v in vers]),
        "schema_ver": pa.array(vers)})
    fixtures.write_wal_segments(ev, os.path.join(root, "wal"), 4, r)

    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=os.path.join(root, "lake"),
                       num_partitions=4, max_segments_per_epoch=1,
                       validate=True)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, r)
    assert got.equals(exp)
    # the skip landed in a durable manifest, named and auditable
    notes = []
    lake = LakeState(cfg.lake_dir)
    for e in lake.committed_epochs():
        notes += lake.load(e).stats.get("ddl_skipped", [])
    assert "add_index:idx_doc" in notes
    assert "exchange_partition:p0" in notes


def test_vector_column_replicates_through_the_changefeed(tmp_path):
    """TiDB VECTOR(d) (tests/integration_tests/vector: VECTOR(5) columns,
    ALTER TABLE ADD column emb VECTOR(3)): the vector type rides the DDL
    lattice as list<float32> with a dimension-checked typed default, and
    a changefeed with an add_column vector barrier replays to the oracle."""
    import os

    import numpy as np
    import pytest

    from tiflow_ray import fixtures, oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp

    r = SchemaRegistry([
        DDL(50, "add_column", "emb:vector(3)", "[0.0,0.0,0.0]", 2),
    ])
    assert r.schema(2).field("emb").type == pa.list_(pa.float32())
    assert r.defaults(2) == {"emb": [0.0, 0.0, 0.0]}
    with pytest.raises(AssertionError, match="not 3-dimensional"):
        SchemaRegistry([DDL(5, "add_column", "v:vector(3)", "[1.0]", 2)])

    root = str(tmp_path / "fx")
    os.makedirs(root)
    n = 40
    dnum = np.arange(n, dtype=np.int64)
    base = pa.table({
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "tokens": pa.array([[0]] * n, pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(["seed"] * n)})
    fixtures.write_base_partitioned(base, root, 4)
    cts = np.arange(10, 10 + 4 * n, 4, dtype=np.uint64)
    vers = np.array([r.version_at(int(t)) for t in cts], np.int32)
    ev = pa.table({
        "op": pa.array(np.full(n, 2, np.uint8)),
        "commit_ts": pa.array(cts),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "pre_tokens": pa.nulls(n, pa.list_(pa.int32())),
        "new_doc_id": pa.nulls(n, pa.string()),
        "tokens": pa.array([[int(d)] for d in dnum], pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(["web"] * n),
        "emb": pa.array(
            [([float(d), float(d) + 0.5, -1.0] if v >= 2 else None)
             for d, v in zip(dnum, vers)], pa.list_(pa.float32())),
        "schema_ver": pa.array(vers)})
    fixtures.write_wal_segments(ev, os.path.join(root, "wal"), 4, r)

    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=os.path.join(root, "lake"),
                       num_partitions=4, max_segments_per_epoch=1,
                       validate=True)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, r)
    assert got.schema.field("emb").type == pa.list_(pa.float32())
    assert got.equals(exp)
