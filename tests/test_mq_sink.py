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
