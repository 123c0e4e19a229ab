"""MQ sink: dispatchers, per-partition ordering, canal-json payloads."""

import numpy as np
import pyarrow as pa

from tiflow_ray.sinks.mq import MqSinkStage, dispatch


def _events(n=200, seed=5):
    rng = np.random.default_rng(seed)
    docs = rng.integers(0, 20, n)
    op = rng.integers(1, 4, n).astype(np.uint8)
    has_img = op != 1          # deletes carry no image (real CDC shape)
    return pa.table({
        "op": pa.array(op),
        "commit_ts": pa.array(rng.integers(1000, 9999, n).astype(np.uint64)),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "doc_id": pa.array([f"doc-{d:012d}" for d in docs]),
        "tokens": pa.array([[int(d), 7] if h else None
                            for d, h in zip(docs, has_img)],
                           pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 2, np.int32), mask=~has_img),
        "source": pa.array(np.where(has_img, "web", None), pa.string()),
        "pre_tokens": pa.nulls(n, pa.list_(pa.int32())),
        "new_doc_id": pa.nulls(n, pa.string()),
        "schema_ver": pa.array(np.ones(n, np.int32)),
    })


def test_key_dispatch_keeps_each_key_in_one_partition():
    t = dispatch(_events(), 8, "key")
    import pandas as pd
    df = pd.DataFrame({"doc": t["doc_id"].to_pylist(),
                       "p": t["mq_partition"].to_pylist()})
    assert (df.groupby("doc")["p"].nunique() == 1).all()


def test_dispatchers_cover_and_table_is_constant():
    t = _events()
    for d in ("key", "index-value", "ts"):
        parts = dispatch(t, 4, d)["mq_partition"].to_numpy()
        assert parts.min() >= 0 and parts.max() < 4
    assert (dispatch(t, 4, "table")["mq_partition"].to_numpy() == 0).all()


def test_open_protocol_roundtrip():
    from tiflow_ray.sources.codecs import (decode_open_protocol_lines,
                                           encode_open_protocol)
    t = _events(50, seed=9)
    text = encode_open_protocol(t)
    back = decode_open_protocol_lines(text.splitlines(), t.column_names)
    assert back.equals(t)


def test_mq_sink_open_protocol_payloads():
    import json
    t = dispatch(_events(40, seed=2), 2, "key")
    msgs = MqSinkStage(protocol="open_protocol")(
        t.filter(pa.compute.equal(t["mq_partition"], 0)))
    objs = [json.loads(s) for s in msgs["payload"].to_pylist()]
    assert all("key" in o and "value" in o for o in objs)
    assert all(("u" in o["value"]) != ("d" in o["value"]) for o in objs)


def test_partition_stream_ordered_with_dense_offsets():
    import json
    t = dispatch(_events(), 4, "key")
    sink = MqSinkStage()
    for p in range(4):
        sub = t.filter(pa.compute.equal(t["mq_partition"], p))
        if sub.num_rows == 0:
            continue
        msgs = sink(sub)
        assert msgs["offset"].to_pylist() == list(range(sub.num_rows))
        objs = [json.loads(s) for s in msgs["payload"].to_pylist()]
        key_order = [(o["es"], o["ts"]) for o in objs]
        assert key_order == sorted(key_order)      # commit_ts, start_ts order
        assert all(o["type"] in ("INSERT", "UPDATE", "DELETE") for o in objs)


def test_avro_registry_idempotent_and_versioned(tmp_path):
    """Confluent-registry analog: same schema re-registers to the same id
    (incl. field-order-insensitive canonical compare); an evolved schema
    gets a new global id and the next subject version; ids resolve back."""
    import json

    from tiflow_ray.sinks.avro_registry import AvroSchemaRegistry

    root = str(tmp_path / "registry")
    reg = AvroSchemaRegistry(root)
    s1 = json.dumps({"type": "record", "name": "E",
                     "fields": [{"name": "a", "type": "long"}]})
    id1 = reg.register("t-value", s1)
    assert AvroSchemaRegistry(root).register("t-value", s1) == id1
    s2 = json.dumps({"type": "record", "name": "E",
                     "fields": [{"name": "a", "type": "long"},
                                {"name": "b", "type": ["null", "string"]}]})
    id2 = reg.register("t-value", s2)
    assert id2 != id1
    assert reg.versions("t-value") == [1, 2]
    assert reg.latest("t-value")[0] == id2
    assert json.loads(reg.schema_by_id(id1))["fields"][0]["name"] == "a"


def test_mq_sink_avro_protocol_roundtrip(tmp_path):
    """K4 × avro: per-event Confluent-framed binary datums (magic 0x00 +
    BE uint32 schema id + bare avro record) decode back bit-exactly via
    the registry-held writer schema."""
    from tiflow_ray.sinks.avro_registry import (AvroMessageDecoder,
                                                unframe_message)

    root = str(tmp_path / "registry")
    t = dispatch(_events(60, seed=3), 2, "key")
    cols = [c for c in t.column_names if c != "mq_partition"]
    from tiflow_ray.model import sort_events_table
    sink = MqSinkStage(protocol="avro", registry_root=root)
    parts = []
    for p in (0, 1):
        msgs = sink(t.filter(pa.compute.equal(t["mq_partition"], p)))
        payloads = msgs["payload"].to_pylist()
        sid, _ = unframe_message(payloads[0])
        assert all(unframe_message(m)[0] == sid for m in payloads)
        dec = AvroMessageDecoder(root, cols)
        back = dec.decode(payloads)
        exp = sort_events_table(
            t.filter(pa.compute.equal(t["mq_partition"], p))
             .drop_columns(["mq_partition"]), with_doc=False)
        assert back.equals(exp)
        parts.append(len(payloads))
    assert sum(parts) == t.num_rows


def test_avro_registry_concurrent_same_schema_converges(tmp_path):
    """Two independent registry handles racing the SAME schema from
    different processes' worth of state converge on one id (the O_EXCL
    arbitration path)."""
    import json

    from tiflow_ray.sinks.avro_registry import AvroSchemaRegistry

    root = str(tmp_path / "registry")
    s = json.dumps({"type": "record", "name": "E",
                    "fields": [{"name": "x", "type": "long"}]})
    ids = {AvroSchemaRegistry(root).register("s-value", s)
           for _ in range(6)}
    assert len(ids) == 1


def test_watermark_broadcast_rides_every_partition(t1_fixture, tmp_path):
    """produce_mq ends each partition's stream with a TIDB_WATERMARK
    control message (the canal-json TiDB extension resolved event);
    consume_mq reads the resolved ts IN-BAND and stamps the derived
    WAL's segment metas with it instead of inferring from event maxima."""
    import json as _json
    import os

    import pyarrow.parquet as _pq

    from tiflow_ray import oracle
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.pipelines.mq import consume_mq, produce_mq
    from tiflow_ray.sources.codecs import (decode_canal_watermark,
                                           encode_canal_watermark)
    from tiflow_ray.sources.wal import list_segments

    assert decode_canal_watermark(encode_canal_watermark(12345)) == 12345

    root, reg, _metas, _info = t1_fixture
    msg_dir = str(tmp_path / "msgs")
    produce_mq(os.path.join(root, "wal"), msg_dir, num_partitions=4)
    stream_wm = max(s.watermark_ts
                    for s in list_segments(os.path.join(root, "wal")))
    for d in sorted(os.listdir(msg_dir)):
        if not d.startswith("partition="):
            continue
        msgs = _pq.read_table(os.path.join(msg_dir, d, "messages.parquet"))
        keys = msgs["key"].to_pylist()
        assert keys[-1] == "__watermark__", d
        assert keys.count("__watermark__") == 1
        obj = _json.loads(msgs["payload"][-1].as_py())
        assert obj["type"] == "TIDB_WATERMARK" and obj["es"] == stream_wm

    lake = str(tmp_path / "lake")
    res = consume_mq(msg_dir, lake, base_dir=os.path.join(root, "base"),
                     num_partitions=8)
    # derived-WAL metas carry the broadcast resolved ts
    for s in list_segments(res["wal_dir"]):
        assert s.watermark_ts == stream_wm
    got = rp.lake_to_table(lake, res["wal_dir"])
    assert got.equals(oracle.replay_to_table(root, reg))
