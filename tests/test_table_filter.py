"""Table-filter pattern language (tidb table-filter semantics: wildcards,
bare-schema rules, `~` regex parts, `!` exclusions, last-match-wins,
no-match excluded) and the MQ EventRouter built on it
(cdc/sink/dmlsink/mq/dispatcher/event_router.go: first-match routing,
appended *.* default, {schema}/{table} topic substitution)."""

import numpy as np
import pyarrow as pa

from tiflow_ray.sinks.mq import DispatchRule, EventRouter
from tiflow_ray.stages.table_filter import TableFilter


def test_wildcards_and_last_match_wins():
    f = TableFilter(["*.*", "!test.*", "test.keepme"])
    assert f.match("prod", "users")
    assert not f.match("test", "scratch")        # excluded by rule 2
    assert f.match("test", "keepme")             # resurrected by LAST rule
    # reversed order: exclusion last wins
    g = TableFilter(["test.keepme", "!test.*"])
    assert not g.match("test", "keepme")


def test_no_match_is_excluded_and_bare_schema_rule():
    f = TableFilter(["db1"])                     # bare schema: all tables
    assert f.match("db1", "anything")
    assert not f.match("db2", "anything")        # matched no rule
    assert not TableFilter([]).match("a", "b")


def test_wildcard_chars_and_char_classes():
    f = TableFilter(["db?.t[0-3]", "log*.[!a]*"])
    assert f.match("db1", "t2")
    assert not f.match("db1", "t5")              # outside [0-3]
    assert not f.match("db12", "t1")             # ? is exactly one char
    assert f.match("logs2024", "btable")
    assert not f.match("logs", "atable")         # [!a] rejects leading a
    # anchoring: wildcard patterns are full matches
    assert not f.match("db1x", "t1")


def test_regex_parts_and_case_sensitivity():
    f = TableFilter(["db0.~^vi"])
    assert f.match("db0", "view")                # unanchored regex: prefix
    assert f.match("db0", "visits")
    assert not f.match("db0", "review")          # ^ anchors the regex itself
    assert f.match("DB0", "VIEW")                # case-insensitive default
    strict = TableFilter(["db0.~^vi"], case_sensitive=True)
    assert not strict.match("DB0", "view")


def test_vectorized_mask_matches_scalar():
    f = TableFilter(["db*.click", "db1.*", "!db1.purchase"])
    rng = np.random.default_rng(11)
    schemas = np.array(["db0", "db1", "dbx"])[rng.integers(0, 3, 300)]
    tables = np.array(["click", "view", "purchase"])[rng.integers(0, 3, 300)]
    got = f.mask(schemas, tables)
    want = np.array([f.match(s, t) for s, t in zip(schemas, tables)])
    assert (got == want).all()


def test_event_router_first_match_and_default():
    r = EventRouter([
        DispatchRule(("db0.click",), "ts", "clicks-{schema}"),
        DispatchRule(("db*.view", "!db1.view"), "index-value", "views"),
    ], default_topic="events")
    assert r.route("db0", "click") == ("clicks-db0", "ts")
    assert r.route("db0", "view") == ("views", "index-value")
    # excluded inside rule 2's own matcher -> falls through to the default
    assert r.route("db1", "view") == ("events", "table")
    assert r.route("zzz", "t") == ("events", "table")


def test_route_batch_vectorized_and_table_dispatch_stable():
    r = EventRouter([DispatchRule(("db0.click",), "ts", "c-{table}")],
                    default_topic="bus")
    n = 200
    rng = np.random.default_rng(5)
    t = pa.table({
        "schema_name": pa.array(np.array(["db0", "db1"])[
            rng.integers(0, 2, n)]),
        "table_name": pa.array(np.array(["click", "view"])[
            rng.integers(0, 2, n)]),
        "doc_id": pa.array([f"doc-{i}" for i in range(n)]),
        "commit_ts": pa.array(np.arange(n, dtype=np.uint64)),
    })
    out = r.route_batch(t, 8)
    topics = np.asarray(out["mq_topic"].to_numpy(zero_copy_only=False))
    parts = out["mq_partition"].to_numpy()
    schemas = np.asarray(t["schema_name"].to_numpy(zero_copy_only=False))
    tables = np.asarray(t["table_name"].to_numpy(zero_copy_only=False))
    hit = (schemas == "db0") & (tables == "click")
    assert (topics[hit] == "c-click").all()
    assert (parts[hit] == np.arange(n)[hit] % 8).all()        # ts dispatch
    assert (topics[~hit] == "bus").all()
    # default = table dispatcher: one stable partition per table identity
    for s, tb in {("db0", "view"), ("db1", "click"), ("db1", "view")}:
        m = (schemas == s) & (tables == tb)
        if m.any():
            assert len(set(parts[m].tolist())) == 1


def test_replay_with_table_filter_drops_unselected_tables(tmp_path,
                                                          ray_session):
    """Engine e2e: a WAL carrying a second table's rows replays to the
    clean single-table oracle only because cfg.table_filter selects it."""
    import pyarrow.parquet as pq

    from tiflow_ray import fixtures, oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.sources.wal import list_segments

    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1")
    wal = pa.concat_tables([pq.read_table(s.path)
                            for s in list_segments(f"{root}/wal")],
                           promote_options="default")
    real = wal.append_column("table_name",
                             pa.array(np.full(wal.num_rows, "documents"),
                                      pa.string()))
    alien = wal.filter(pa.array(np.arange(wal.num_rows) % 3 == 0))
    alien = alien.set_column(
        alien.column_names.index("commit_ts"), "commit_ts",
        pa.array(alien["commit_ts"].to_numpy(zero_copy_only=False) + 1,
                 pa.uint64()))
    alien = alien.append_column(
        "table_name", pa.array(np.full(alien.num_rows, "audit_log"),
                               pa.string()))
    mixed = str(tmp_path / "mixed_wal")
    fixtures.write_wal_segments(pa.concat_tables([real, alien]), mixed,
                                4, reg)

    from tiflow_ray.stages.table_filter import TableFilter
    cfg = ReplayConfig(wal_dir=mixed, lake_dir=str(tmp_path / "lake"),
                       num_partitions=8,
                       table_filter=TableFilter(["*.documents"]))
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)


def test_toml_table_filter_rules(tmp_path):
    from tiflow_ray.config import load_config
    toml = tmp_path / "cf.toml"
    toml.write_text("""
wal_dir = "/dev/null"
table_filter_rules = ["*.*", "!test.*"]
""")
    cfg = load_config(str(toml))
    assert cfg.table_filter.match("prod", "users")
    assert not cfg.table_filter.match("test", "x")


def test_table_router_route_and_extract():
    """DM route-rules: first-match routing + extend-column extraction
    (FetchExtendColumn analog): capture groups join; no match = ''."""
    from tiflow_ray.stages.table_router import (Extractor, RouteRule,
                                                TableRouter)
    r = TableRouter([
        RouteRule("shard_*", "t_*", target_schema="m", target_table="t",
                  extract_schema=Extractor(r"shard_(.*)", "shard"),
                  extract_source=Extractor(r"mysql-(\d+)-(\w+)", "src")),
        RouteRule("logs", target_table="log_all"),
    ])
    assert r.route("shard_7", "t_2") == ("m", "t")
    assert r.route("logs", "anything") == ("logs", "log_all")
    assert r.route("other", "x") == ("other", "x")           # unmatched
    cols, vals = r.fetch_extend_column("shard_7", "t_2", "mysql-01-east")
    assert cols == ["shard", "src"]
    assert vals == ["7", "01east"]                # groups joined
    cols2, vals2 = r.fetch_extend_column("shard_7", "t_2", "nomatch")
    assert vals2 == ["7", ""]                     # regexp miss -> ''
    assert r.fetch_extend_column("other", "x", "s") == ([], [])


def test_table_router_batch_uniform_schema():
    import pyarrow as pa

    from tiflow_ray.stages.table_router import (Extractor, RouteRule,
                                                TableRouter)
    r = TableRouter([RouteRule("shard_*", "t_*", target_schema="m",
                               target_table="t",
                               extract_schema=Extractor(r"shard_(.*)",
                                                        "shard"))])
    t = pa.table({"schema_name": pa.array(["shard_1", "sys", "shard_2"]),
                  "table_name": pa.array(["t_0", "audit", "t_9"])})
    out = r.route_batch(t, "src")
    assert out["schema_name"].to_pylist() == ["m", "sys", "m"]
    assert out["table_name"].to_pylist() == ["t", "audit", "t"]
    assert out["shard"].to_pylist() == ["1", None, "2"]   # null off-rule
