"""K5 via MQ: DDL events travel the message stream as canal-json
isDdl messages (broadcast to every partition), and a consumer can rebuild
the FULL replicated state — registry + events — from messages alone
(cdc/sink/ddlsink/mq + the kafka-consumer side of
cmd/kafka-consumer, format-level)."""

import os

import pyarrow as pa
import pytest

from tiflow_ray import fixtures, oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.sinks.mq import MqSinkStage, dispatch
from tiflow_ray.sources.codecs import (decode_canal_ddl_lines,
                                       decode_canal_lines, ddl_to_sql,
                                       sql_to_ddl)
from tiflow_ray.sources.wal import list_segments
from tiflow_ray.stages.schema_evo import DDL, SchemaRegistry


def test_ddl_sql_roundtrip_all_kinds():
    """Every DDL kind → SQL text → DDL, bit-exact (incl. quoted defaults
    and parameterized type specs)."""
    ddls = [
        DDL(100, "add_column", "lang:string", "u'nd", 2),
        DDL(200, "add_column", "tags:set<string>", None, 3),
        DDL(250, "add_column", "grade:enum('a','b')", "a", 4),
        DDL(300, "modify_column", "n_tok:int64", None, 5),
        DDL(400, "rename_column", "lang>language", None, 6),
        DDL(500, "drop_column", "grade", None, 7),
        DDL(600, "truncate", "*", None, 8),
    ]
    for d in ddls:
        back = sql_to_ddl(ddl_to_sql(d), d.barrier_ts, d.schema_ver)
        assert back == d, f"{ddl_to_sql(d)!r} → {back}"


def test_mq_stream_with_ddl_reconstructs_lake(tmp_path):
    """Full MQ round trip: WAL (with DDLs) → dispatch → canal-json DML
    messages + broadcast DDL messages → consumer decodes both, rebuilds
    the registry and a WAL, replays — final lake equals the sequential
    oracle of the ORIGINAL stream."""
    import numpy as np
    import pyarrow.parquet as pq

    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1")
    P = 4

    # ---- producer side: one message per event + DDL broadcast ----------
    segs = [pq.read_table(s.path) for s in list_segments(f"{root}/wal")]
    events = pa.concat_tables(segs, promote_options="default")
    sink = MqSinkStage(protocol="canal_json")
    tagged = dispatch(events, P, "key")
    streams = {p: sink(tagged.filter(pa.compute.equal(tagged["mq_partition"], p)))
               for p in range(P)}
    ddl_msgs = sink.ddl_stream(reg, P)

    # ---- consumer side: decode, rebuild registry + WAL, replay ---------
    # every partition carries the identical DDL sequence (broadcast)
    per_part_ddls = [
        ddl_msgs.filter(pa.compute.equal(ddl_msgs["mq_partition"], p))
                .sort_by("offset")["payload"].to_pylist()
        for p in range(P)]
    assert all(d == per_part_ddls[0] for d in per_part_ddls[1:])
    reg2 = decode_canal_ddl_lines(per_part_ddls[0])
    assert reg2.to_json() == reg.to_json()

    sup_cols = ["op", "commit_ts", "start_ts", "doc_id", "tokens", "n_tok",
                "source", "lang", "pre_tokens", "new_doc_id", "schema_ver"]
    decoded = pa.concat_tables([
        decode_canal_lines(streams[p]["payload"].to_pylist(), sup_cols)
        for p in range(P)])
    order = pa.compute.sort_indices(
        decoded, sort_keys=[("commit_ts", "ascending"),
                            ("start_ts", "ascending")])
    decoded = decoded.take(order)

    dst = str(tmp_path / "rebuilt")
    os.makedirs(f"{dst}/wal", exist_ok=True)
    fixtures.write_wal_segments(decoded, f"{dst}/wal", len(segs), reg2)

    cfg = ReplayConfig(wal_dir=f"{dst}/wal", lake_dir=str(tmp_path / "lake"),
                       num_partitions=8, validate=True)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp), "MQ-reconstructed lake diverged from oracle"


def test_ddl_stream_requires_canal_json():
    with pytest.raises(AssertionError):
        MqSinkStage(protocol="open_protocol").ddl_stream(
            SchemaRegistry([]), 2)


def test_mq_produce_consume_pipeline_matches_oracle(tmp_path):
    """The user-facing MQ loop (pipelines/mq.py, kafka-consumer analog):
    produce_mq writes partitioned message logs, consume_mq rebuilds the
    lake from messages alone — equal to the sequential oracle; re-running
    consume is idempotent (message logs + derived WAL are the durable
    state)."""
    from tiflow_ray.pipelines.mq import consume_mq, produce_mq

    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1")
    msg_dir = str(tmp_path / "mq")
    out = produce_mq(f"{root}/wal", msg_dir, num_partitions=4)
    assert out["partitions"] == 4 and out["ddl_messages"] == len(reg.ddls)

    lake = str(tmp_path / "lake")
    res = consume_mq(msg_dir, lake, base_dir=f"{root}/base",
                     num_partitions=8)
    got = rp.lake_to_table(lake, res["wal_dir"])
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp), "MQ-consumed lake diverged from oracle"

    res2 = consume_mq(msg_dir, lake, num_partitions=8)
    assert res2["epochs"] == 0
    assert rp.lake_to_table(lake, res["wal_dir"]).equals(exp)


@pytest.mark.parametrize("protocol", ["open_protocol", "avro"])
def test_mq_pipeline_other_protocols(tmp_path, protocol):
    """The MQ loop under every DML wire protocol (canal covered by the
    test above): open-protocol text and Confluent-framed avro binary via
    the file-backed schema registry; DDL broadcast stays canal-json."""
    from tiflow_ray.pipelines.mq import consume_mq, produce_mq

    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1")
    msg_dir = str(tmp_path / "mq")
    out = produce_mq(f"{root}/wal", msg_dir, num_partitions=4,
                     protocol=protocol)
    assert out["partitions"] == 4
    lake = str(tmp_path / "lake")
    res = consume_mq(msg_dir, lake, base_dir=f"{root}/base",
                     num_partitions=8)
    got = rp.lake_to_table(lake, res["wal_dir"])
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp), f"{protocol} MQ-consumed lake diverged"


@pytest.mark.parametrize("option", ["handle_key_only", "claim_check"])
def test_mq_large_message_options_roundtrip(tmp_path, option):
    """Large-message handling (pkg/config/large_message.go): with a tiny
    max_message_bytes every DML message is oversize; under
    handle_key_only the topic carries key-only stubs the consumer
    re-fetches from the UPSTREAM WAL, under claim_check payloads live in
    the claim store behind pointer messages. Either way the consumed
    lake must equal the sequential oracle."""
    import glob as _glob
    import json as _json

    from tiflow_ray.pipelines.mq import consume_mq, produce_mq

    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1_noddl")
    msg_dir = str(tmp_path / "mq")
    out = produce_mq(f"{root}/wal", msg_dir, num_partitions=4,
                     max_message_bytes=16, large_handle=option)
    assert out["partitions"] == 4
    # the topic really carries stubs/pointers, not payloads
    import pyarrow.parquet as _pq
    msgs = _pq.read_table(os.path.join(msg_dir, "partition=0",
                                       "messages.parquet"))
    marker = '{"onlyHandleKey"' if option == "handle_key_only" \
        else '{"claimCheckLocation"'
    # every EVENT payload is a stub/pointer; the trailing TIDB_WATERMARK
    # control message is not an event and rides uncapped
    assert all(p.startswith(marker) for k, p in
               zip(msgs["key"].to_pylist(),
                   msgs["payload"].to_pylist())
               if k != "__watermark__"), "payloads left in the topic"
    if option == "claim_check":
        assert _glob.glob(os.path.join(msg_dir, "_claim", "*.msg"))

    lake = str(tmp_path / "lake")
    kw = {"upstream_wal": f"{root}/wal"} if option == "handle_key_only" \
        else {}
    res = consume_mq(msg_dir, lake, base_dir=f"{root}/base",
                     num_partitions=8, **kw)
    got = rp.lake_to_table(lake, res["wal_dir"])
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp), f"{option} lake diverged from oracle"


def test_mq_large_message_none_rejects(tmp_path):
    """Default option 'none' must fail loudly on an oversize message (the
    broker would bounce it anyway) instead of silently truncating."""
    from tiflow_ray.pipelines.mq import produce_mq

    root = str(tmp_path / "src")
    fixtures.generate_tier(root, "t1_noddl")
    with pytest.raises(Exception, match="max_message_bytes"):
        produce_mq(f"{root}/wal", str(tmp_path / "mq"), num_partitions=2,
                   max_message_bytes=16, large_handle="none")


def test_mq_handle_key_only_with_mid_stream_ddl(tmp_path):
    """ADVICE r4: the handle-key-only re-fetch must read each upstream
    segment under ITS OWN schema. Segments straddling a DDL barrier have
    heterogeneous physical schemas; a single dataset over all of them
    unifies to the first fragment's schema and silently NULLs columns
    added after the barrier in the re-encoded message. The t1 fixture
    has add/drop-column DDLs mid-stream, so post-barrier rows carry
    columns absent from segment 0."""
    from tiflow_ray.pipelines.mq import consume_mq, produce_mq

    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1")
    msg_dir = str(tmp_path / "mq")
    produce_mq(f"{root}/wal", msg_dir, num_partitions=4,
               max_message_bytes=16, large_handle="handle_key_only")
    lake = str(tmp_path / "lake")
    res = consume_mq(msg_dir, lake, base_dir=f"{root}/base",
                     num_partitions=8, upstream_wal=f"{root}/wal")
    got = rp.lake_to_table(lake, res["wal_dir"])
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp), \
        "handle_key_only + mid-stream DDL lake diverged from oracle"


def test_mq_consumer_group_splits_partitions(tmp_path):
    """VERDICT r4 #9 (cmd/kafka-consumer consumer-group shape): two
    consumers each own half the topic partitions via per-member offset
    checkpoints; the first returns pending, the member completing
    coverage stamps metas and replays — converging to the IDENTICAL lake
    a single consumer produces. Member re-runs are idempotent via their
    committed offsets."""
    import json as _json

    from tiflow_ray.pipelines.mq import consume_mq, produce_mq

    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1")
    msg_dir = str(tmp_path / "mq")
    produce_mq(f"{root}/wal", msg_dir, num_partitions=4)

    # reference: one consumer, whole topic
    lake1 = str(tmp_path / "lake_single")
    consume_mq(msg_dir, lake1, base_dir=f"{root}/base", num_partitions=8)
    exp = rp.lake_to_table(lake1, os.path.join(lake1, "_mq_wal"))

    # consumer group of 2
    lake2 = str(tmp_path / "lake_group")
    r0 = consume_mq(msg_dir, lake2, base_dir=None, num_partitions=8,
                    group=(0, 2))
    assert r0["pending"] == [1, 3]          # member 0 owns parts 0, 2
    assert sorted(r0["consumed"]) == [0, 2]
    # member 0's offsets are committed durably
    ck = os.path.join(lake2, "_mq_wal", "_consumer", "member-0.json")
    with open(ck) as f:
        offs = _json.load(f)["partitions"]
    assert set(offs) == {"0", "2"}
    assert all(v["offset"] > 0 for v in offs.values())
    # re-running member 0 is an offset-checkpointed no-op, still pending
    assert consume_mq(msg_dir, lake2, base_dir=None, num_partitions=8,
                      group=(0, 2))["pending"] == [1, 3]
    # member 1 completes coverage → stamps + replays
    r1 = consume_mq(msg_dir, lake2, base_dir=f"{root}/base",
                    num_partitions=8, group=(1, 2))
    assert "pending" not in r1 and r1["epochs"] > 0
    got = rp.lake_to_table(lake2, r1["wal_dir"])
    assert got.equals(exp), "consumer-group lake diverged from single"
    assert got.equals(oracle.replay_to_table(root, reg))
