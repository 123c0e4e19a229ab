# Streaming MQ changefeed: produce_mq(producer_state=...) turns the MQ
# sink incremental (only unsent WAL segments, appended streams, a
# TIDB_WATERMARK broadcast per call) and consume_mq_stream applies each
# round up to the broadcast resolved ts — the storage-consumer /
# kafka-consumer tick loop, both ends checkpointed.
import json
import os
import shutil
import threading
import time

import pyarrow.parquet as pq
import pytest

from tiflow_ray import oracle
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.pipelines.mq import (consume_mq_stream, fetch_mq,
                                     produce_mq)
from tiflow_ray.sources.wal import list_segments


def _staged_wal(t1_root, tmp_path, n_first):
    """A 'growing' WAL dir seeded with the first n segments; returns
    (live_wal, remaining segment paths to copy later)."""
    src = os.path.join(t1_root, "wal")
    live = str(tmp_path / "live_wal")
    os.makedirs(live)
    segs = list_segments(src)
    for s in segs[:n_first]:
        for ext in (".parquet", ".meta.json"):
            b = os.path.basename(s.path).replace(".parquet", ext)
            shutil.copy(os.path.join(src, b), os.path.join(live, b))
    shutil.copy(os.path.join(src, "ddl.json"),
                os.path.join(live, "ddl.json"))
    return live, segs[n_first:]


def _grow(live, seg):
    for ext in (".parquet", ".meta.json"):
        b = os.path.basename(seg.path).replace(".parquet", ext)
        shutil.copy(os.path.join(os.path.dirname(seg.path), b),
                    os.path.join(live, b))


def test_streaming_rounds_file_mode(t1_fixture, tmp_path):
    """Two produce rounds over a growing WAL; each consume round applies
    exactly up to that round's broadcast resolved ts; the final lake
    equals the full oracle; an idle round is a no-op."""
    root, reg, _metas, _info = t1_fixture
    live, rest = _staged_wal(root, tmp_path, 2)
    msg_dir = str(tmp_path / "msgs")
    state = str(tmp_path / "producer.json")
    lake = str(tmp_path / "lake")

    r1 = produce_mq(live, msg_dir, num_partitions=4, producer_state=state)
    wm1 = r1["watermark_ts"]
    assert r1["segments_produced"] == 2
    c1 = consume_mq_stream(msg_dir, lake, base_dir=os.path.join(root,
                                                                "base"),
                           num_partitions=8)
    assert c1["rounds"] == 1 and c1["watermark_ts"] == wm1
    got = rp.lake_to_table(lake, c1["wal_dir"])
    assert got.equals(oracle.replay_to_table(root, reg,
                                             max_watermark=wm1))

    for seg in rest:
        _grow(live, seg)
    r2 = produce_mq(live, msg_dir, num_partitions=4, producer_state=state)
    assert r2["segments_produced"] == len(rest)
    assert r2["watermark_ts"] > wm1
    c2 = consume_mq_stream(msg_dir, lake, num_partitions=8)
    assert c2["rounds"] == 1 and c2["watermark_ts"] == r2["watermark_ts"]
    got = rp.lake_to_table(lake, c2["wal_dir"])
    assert got.equals(oracle.replay_to_table(root, reg))

    # nothing new → checkpointed no-op on BOTH ends
    r3 = produce_mq(live, msg_dir, num_partitions=4, producer_state=state)
    assert r3["segments_produced"] == 0
    c3 = consume_mq_stream(msg_dir, lake, num_partitions=8)
    assert c3["rounds"] == 0


def test_streaming_pending_until_frontier_known(t1_fixture, tmp_path):
    """A partition that never confirmed a resolved ts holds the whole
    round (frontier unknown — the zero-segment-shard rule)."""
    root, _reg, _metas, _info = t1_fixture
    msg_dir = str(tmp_path / "msgs")
    produce_mq(os.path.join(root, "wal"), msg_dir, num_partitions=4)
    # strip partition 0's watermark row
    p0 = os.path.join(msg_dir, "partition=0", "messages.parquet")
    t = pq.read_table(p0)
    import pyarrow.compute as pc
    t = t.filter(pc.not_equal(t["key"], "__watermark__"))
    pq.write_table(t, p0)
    out = consume_mq_stream(msg_dir, str(tmp_path / "lake"),
                            base_dir=os.path.join(root, "base"),
                            num_partitions=8)
    assert out.get("pending") and out["partition"] == 0


def test_streaming_live_over_the_wire(t1_fixture, tmp_path):
    """The full live topology: a producer committing WAL segments and
    producing rounds over the Kafka wire; a consumer loop fetching and
    applying up to each broadcast resolved ts — converges to the oracle."""
    from tiflow_ray.sinks.kafka_wire import KafkaLiteBroker

    root, reg, _metas, _info = t1_fixture
    live, rest = _staged_wal(root, tmp_path, 1)
    state = str(tmp_path / "producer.json")
    spool = str(tmp_path / "spool")
    lake = str(tmp_path / "lake")
    final_wm = max(s.watermark_ts
                   for s in list_segments(os.path.join(root, "wal")))

    with KafkaLiteBroker(str(tmp_path / "blog")) as b:
        addr = f"{b.host}:{b.port}"

        def producer():
            produce_mq(live, "", num_partitions=4, broker=addr,
                       topic="cf", producer_state=state)
            for seg in rest:
                time.sleep(0.3)
                _grow(live, seg)
                produce_mq(live, "", num_partitions=4, broker=addr,
                           topic="cf", producer_state=state)

        th = threading.Thread(target=producer)
        th.start()
        # the consumer DAEMON loop (tail_consume_mq = cmd/kafka-consumer's
        # run loop): started before the producer's topic even exists,
        # polls, applies every round, stops once idle
        from tiflow_ray.pipelines.mq import tail_consume_mq
        out = tail_consume_mq(addr, "cf", spool, lake,
                              base_dir=os.path.join(root, "base"),
                              num_partitions=8, poll_secs=0.2,
                              idle_timeout=6.0)
        th.join(timeout=30)
        applied = out["watermark_ts"]
    assert applied == final_wm, "consumer never reached the final wm"
    wal_dir = os.path.join(lake, "_mq_wal")
    got = rp.lake_to_table(lake, wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))


def test_gc_spool_between_rounds(t1_fixture, tmp_path):
    """Retention: trimming consumed spool rows between rounds changes
    nothing — later rounds fetch by offset value and converge to the
    same oracle lake."""
    from tiflow_ray.pipelines.mq import gc_spool

    root, reg, _metas, _info = t1_fixture
    live, rest = _staged_wal(root, tmp_path, 2)
    msg_dir = str(tmp_path / "msgs")
    state = str(tmp_path / "producer.json")
    lake = str(tmp_path / "lake")

    produce_mq(live, msg_dir, num_partitions=4, producer_state=state)
    c1 = consume_mq_stream(msg_dir, lake,
                           base_dir=os.path.join(root, "base"),
                           num_partitions=8)
    g = gc_spool(msg_dir, c1["wal_dir"])
    assert g["rows_removed"] > 0
    for seg in rest:
        _grow(live, seg)
    produce_mq(live, msg_dir, num_partitions=4, producer_state=state)
    c2 = consume_mq_stream(msg_dir, lake, num_partitions=8)
    assert c2["rounds"] == 1
    got = rp.lake_to_table(lake, c2["wal_dir"])
    assert got.equals(oracle.replay_to_table(root, reg))
    # a second gc after full consumption trims the rest except leftovers
    gc_spool(msg_dir, c2["wal_dir"])
    c3 = consume_mq_stream(msg_dir, lake, num_partitions=8)
    assert c3["rounds"] == 0
