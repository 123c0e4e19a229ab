# The Kafka wire loop (sinks/kafka_wire.py + pipelines/mq.py broker
# mode): a loopback broker speaking the public protocol (big-endian
# frames, v0 message sets with CRC), produced to by the MQ sink's Ray
# tasks (kafka_dml_producer.go slot) and fetched back into the consumer
# spool (cmd/kafka-consumer slot).
import os
import struct
import threading
import zlib

import pyarrow.parquet as pq
import pytest

from tiflow_ray.sinks.kafka_wire import (KafkaLiteBroker, KafkaLiteClient,
                                         decode_message_set,
                                         encode_message_set)


@pytest.fixture()
def broker(tmp_path):
    with KafkaLiteBroker(str(tmp_path / "log")) as b:
        yield b


def test_produce_fetch_roundtrip_offsets_dense(broker):
    with KafkaLiteClient(broker.host, broker.port) as c:
        assert c.produce("t", 0, [(b"a", b"1"), (None, b"2")]) == 0
        assert c.produce("t", 0, [(b"c", None)]) == 2
        hw, recs = c.fetch("t", 0, 0)
        assert hw == 3
        assert recs == [(0, b"a", b"1"), (1, None, b"2"), (2, b"c", None)]
        # resume from mid-stream
        assert c.fetch_all("t", 0, 1) == recs[1:]
        assert c.list_offsets("t", 0) == 3
        assert c.list_offsets("t", 0, earliest=True) == 0


def test_fetch_truncates_partial_message_at_max_bytes(broker):
    with KafkaLiteClient(broker.host, broker.port) as c:
        c.produce("t", 0, [(b"k", b"x" * 1000), (b"k2", b"y" * 1000)])
        hw, recs = c.fetch("t", 0, 0, max_bytes=1100)   # second msg cut
        assert hw == 2 and [o for o, _k, _v in recs] == [0]
        # fetch_all transparently drains past the cut
        assert [o for o, _k, _v in c.fetch_all("t", 0, 0)] == [0, 1]
        # a single message bigger than the default window still drains
        # (consumer bumps max_bytes) — exercised with a tiny first window
        hw, recs = c.fetch("t", 0, 1, max_bytes=64)
        assert recs == []                               # too small
        assert [o for o, _k, _v in c.fetch_all("t", 0, 1)] == [1]


def test_corrupt_crc_rejected_nothing_appended(broker):
    with KafkaLiteClient(broker.host, broker.port) as c:
        c.produce("t", 0, [(b"k", b"good")])
        mset = bytearray(encode_message_set([(b"k", b"evil")]))
        mset[-1] ^= 0xFF                    # flip a value byte; CRC stale
        body = bytearray(struct.pack(">hii", 1, 30000, 1))
        body += struct.pack(">h", 1) + b"t"
        body += struct.pack(">ii", 1, 0)
        body += struct.pack(">i", len(mset)) + bytes(mset)
        r = c._call(0, 0, bytes(body))
        pos = 4 + 2 + 1 + 4                 # topics count, name, nparts
        part, err, base = struct.unpack_from(">ihq", r, pos)
        assert (part, err, base) == (0, 2, -1)          # CORRUPT_MESSAGE
        assert c.list_offsets("t", 0) == 1              # nothing appended
        with pytest.raises(ValueError, match="CRC"):
            decode_message_set(bytes(struct.pack(">qi", 0, len(mset) - 12)
                                     + mset[12:]))


def test_errors_unknown_topic_and_offset_out_of_range(broker):
    with KafkaLiteClient(broker.host, broker.port) as c:
        with pytest.raises(RuntimeError, match="error 3"):
            c.fetch("ghost", 0, 0)
        c.produce("t", 0, [(b"k", b"v")])
        with pytest.raises(IndexError, match="past high water"):
            c.fetch("t", 0, 5)
        assert c.metadata()["t"] == [0]
        assert c.metadata(["ghost"]) == {}


def test_concurrent_producers_interleave_without_loss(broker):
    def produce(tag: bytes):
        with KafkaLiteClient(broker.host, broker.port) as c:
            for i in range(50):
                c.produce("t", 0, [(tag, tag + str(i).encode())])

    ts = [threading.Thread(target=produce, args=(t,))
          for t in (b"a", b"b", b"c")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    with KafkaLiteClient(broker.host, broker.port) as c:
        recs = c.fetch_all("t", 0, 0)
    assert [o for o, _k, _v in recs] == list(range(150))
    by_tag = {}
    for _o, k, v in recs:
        by_tag.setdefault(k, []).append(v)
    # per-producer order preserved (offsets are assigned under the
    # partition append lock, one request at a time)
    for tag, vals in by_tag.items():
        assert vals == [tag + str(i).encode() for i in range(50)]


def test_mq_pipeline_over_the_wire_matches_oracle(t1_fixture, tmp_path):
    """produce_mq(broker=...) → fetch_mq → consume_mq == the sequential
    oracle — the whole kafka-consumer e2e with a real wire hop."""
    from tiflow_ray import oracle
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.pipelines.mq import consume_mq, fetch_mq, produce_mq

    root, reg, metas, info = t1_fixture
    spool = str(tmp_path / "spool")
    with KafkaLiteBroker(str(tmp_path / "blog")) as b:
        addr = f"{b.host}:{b.port}"
        r1 = produce_mq(os.path.join(root, "wal"), "", num_partitions=4,
                        broker=addr, topic="cf")
        r2 = fetch_mq(addr, "cf", spool)
        assert r2["messages"] == r1["messages"]
        # a second fetch is an offset-checkpointed no-op
        assert fetch_mq(addr, "cf", spool)["messages"] == 0
    lake = str(tmp_path / "lake")
    res = consume_mq(spool, lake, base_dir=os.path.join(root, "base"),
                     num_partitions=8)
    got = rp.lake_to_table(lake, res["wal_dir"])
    assert got.equals(oracle.replay_to_table(root, reg))


def test_group_fetch_members_split_partitions(t1_fixture, tmp_path):
    """Two fetch members spool disjoint partitions of the same topic;
    together they reconstruct the full message set."""
    from tiflow_ray.pipelines.mq import fetch_mq, produce_mq

    root, _reg, _metas, _info = t1_fixture
    spool = str(tmp_path / "spool")
    with KafkaLiteBroker(str(tmp_path / "blog")) as b:
        addr = f"{b.host}:{b.port}"
        r1 = produce_mq(os.path.join(root, "wal"), "", num_partitions=4,
                        broker=addr, topic="cf")
        a = fetch_mq(addr, "cf", spool, group=(0, 2))
        bb = fetch_mq(addr, "cf", spool, group=(1, 2))
    assert set(a["partitions"]) & set(bb["partitions"]) == set()
    assert a["messages"] + bb["messages"] == r1["messages"]
    spooled = sum(
        pq.read_table(os.path.join(spool, d, "messages.parquet")).num_rows
        for d in os.listdir(spool) if d.startswith("partition="))
    assert spooled == r1["messages"]


def test_group_coordination_range_assignment(broker):
    """JoinGroup/SyncGroup: two concurrent members land in one
    generation and the range assignor splits partitions contiguously;
    heartbeats are accepted while Stable; a later joiner rebalances into
    a higher generation and owns everything."""
    from tiflow_ray.sinks.kafka_wire import join_consumer_group

    with KafkaLiteClient(broker.host, broker.port) as c:
        for p in range(4):
            c.produce("t", p, [(b"k", b"v")])
    results = {}

    def member(tag):
        with KafkaLiteClient(broker.host, broker.port) as c:
            gen, me, parts = join_consumer_group(c, "g", "t")
            results[tag] = (gen, me, parts)
            assert c.heartbeat("g", gen, me) == 0
            c.offset_commit("g", "t", {p: 1 for p in parts})
            c.leave_group("g", me)

    ts = [threading.Thread(target=member, args=(f"m{i}",))
          for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    (g0, _m0, a), (g1, _m1, b) = results["m0"], results["m1"]
    assert g0 == g1 and sorted(a + b) == [0, 1, 2, 3] and not set(a) & set(b)
    with KafkaLiteClient(broker.host, broker.port) as c:
        assert c.offset_fetch("g", "t", [0, 1, 2, 3]) == \
            {0: 1, 1: 1, 2: 1, 3: 1}
        assert c.offset_fetch("g", "t", [9]) == {9: -1}  # never committed
        gen, me, parts = join_consumer_group(c, "g", "t")
        assert parts == [0, 1, 2, 3] and gen > g0
        # stale-generation heartbeat is rejected
        assert c.heartbeat("g", gen - 1, me) == 22
        c.leave_group("g", me)


def test_fetch_mq_coordinated_group(t1_fixture, tmp_path):
    """Two fetch_mq members coordinating via group_id split the topic
    through the broker's group protocol; together they spool everything,
    commit offsets, and the spool replays to the oracle lake."""
    from tiflow_ray import oracle
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.pipelines.mq import consume_mq, fetch_mq, produce_mq

    root, reg, _metas, _info = t1_fixture
    spool = str(tmp_path / "spool")
    results = {}
    with KafkaLiteBroker(str(tmp_path / "blog"), rebalance_wait=0.4) as b:
        addr = f"{b.host}:{b.port}"
        r1 = produce_mq(os.path.join(root, "wal"), "", num_partitions=4,
                        broker=addr, topic="cf")

        def member(tag):
            results[tag] = fetch_mq(addr, "cf", spool, group_id="cg")

        ts = [threading.Thread(target=member, args=(f"m{i}",))
              for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        owned = [set(r["partitions"]) for r in results.values()]
        assert owned[0] | owned[1] == {0, 1, 2, 3} and not owned[0] & owned[1]
        assert sum(r["messages"] for r in results.values()) == r1["messages"]
        with KafkaLiteClient(b.host, b.port) as c:
            committed = c.offset_fetch("cg", "cf", [0, 1, 2, 3])
            assert all(v >= 0 for v in committed.values())
    lake = str(tmp_path / "lake")
    res = consume_mq(spool, lake, base_dir=os.path.join(root, "base"),
                     num_partitions=8)
    got = rp.lake_to_table(lake, res["wal_dir"])
    assert got.equals(oracle.replay_to_table(root, reg))


def test_crc32c_known_answer_and_varints():
    from tiflow_ray.sinks.kafka_wire import (_r_varint, _w_varint, crc32c)
    assert crc32c(b"123456789") == 0xE3069283       # RFC 3720 check value
    assert crc32c(b"") == 0
    for v in (0, 1, -1, 63, 64, -64, -65, 300, -300, 2**31, -2**31,
              2**62, -2**62):
        buf = bytearray()
        _w_varint(buf, v)
        got, pos = _r_varint(bytes(buf), 0)
        assert got == v and pos == len(buf), v


def test_record_batch_roundtrip_and_cross_version(broker):
    """Produce v3 (magic-2 record batches) and fetch back through BOTH
    paths: Fetch v4 re-serves an up-converted batch, Fetch v0 serves the
    stored message set — same records either way (the broker's
    conversion path, exactly what real brokers do for mixed-age
    clients)."""
    recs = [(b"k0", b"v0"), (None, b"v1"), (b"k2", None),
            (b"k3", b"x" * 3000)]
    with KafkaLiteClient(broker.host, broker.port) as c:
        assert c.produce("t2", 0, recs, fmt="v2") == 0
        assert c.produce("t2", 0, [(b"k4", b"v4")], fmt="v0") == 4
        via_v2 = c.fetch_all("t2", 0, fmt="v2")
        via_v0 = c.fetch_all("t2", 0, fmt="v0")
        want = [(i, k, v) for i, (k, v) in enumerate(recs + [(b"k4",
                                                              b"v4")])]
        assert via_v2 == want and via_v0 == want
        # mid-stream resume through the up-converted batch
        assert c.fetch_all("t2", 0, offset=2, fmt="v2") == want[2:]


def test_corrupt_record_batch_rejected(broker):
    import struct as _s

    from tiflow_ray.sinks.kafka_wire import encode_record_batch
    batch = bytearray(encode_record_batch([(b"k", b"evil")]))
    batch[-1] ^= 0xFF                       # flip a value byte; CRC stale
    body = bytearray()
    body += _s.pack(">h", -1)               # transactional_id null
    body += _s.pack(">hii", 1, 30000, 1)
    body += _s.pack(">h", 2) + b"t3"
    body += _s.pack(">ii", 1, 0)
    body += _s.pack(">i", len(batch)) + bytes(batch)
    with KafkaLiteClient(broker.host, broker.port) as c:
        r = c._call(0, 3, bytes(body))
        pos = 4
        (tl,) = struct.unpack_from(">h", r, pos)
        pos += 2 + tl + 4
        part, err, base = struct.unpack_from(">ihq", r, pos)
        assert err == 2 and base == -1      # CORRUPT_MESSAGE
        assert c.metadata(["t3"]).get("t3", []) == []   # nothing appended


def test_unsupported_mid_versions_refused(broker):
    with KafkaLiteClient(broker.host, broker.port) as c:
        # advertised range is contiguous (0..3 / 0..4) but only the ends
        # are dispatched; a middle version gets UNSUPPORTED_VERSION
        r = c._call(0, 2, b"")
        assert struct.unpack_from(">h", r, 0)[0] == 35
        vers = c.api_versions()
        assert vers[0] == (0, 3) and vers[1] == (0, 4)


def test_gzip_record_batch_roundtrip(broker):
    """compression=gzip (attributes codec bits = 1): the records section
    compresses, the CRC32C covers the compressed bytes, and the broker
    stores/serves the same records to both fetch formats."""
    from tiflow_ray.sinks.kafka_wire import (decode_record_batches,
                                             encode_record_batch)
    recs = [(b"k", b"json " * 400), (None, b"more " * 400)]
    batch = encode_record_batch(recs, compression="gzip")
    plain = encode_record_batch(recs)
    assert len(batch) < len(plain) // 4          # it really compressed
    assert [(o, k, v) for o, k, v in decode_record_batches(batch)] == \
        [(i, k, v) for i, (k, v) in enumerate(recs)]
    with KafkaLiteClient(broker.host, broker.port) as c:
        c.produce("tz", 0, recs, fmt="v2", compression="gzip")
        want = [(i, k, v) for i, (k, v) in enumerate(recs)]
        assert c.fetch_all("tz", 0, fmt="v2") == want
        assert c.fetch_all("tz", 0, fmt="v0") == want
