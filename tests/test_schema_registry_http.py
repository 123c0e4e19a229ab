# The Confluent Schema Registry REST service (sinks/schema_registry_http)
# — the endpoint pkg/sink/codec/avro/schema_registry.go registers and
# resolves schemas against, served over loopback HTTP on the same
# directory store as the file-backed registry.
import json
import os
import threading
import urllib.request
from urllib.error import HTTPError

import pytest

from tiflow_ray.sinks.avro_registry import AvroSchemaRegistry
from tiflow_ray.sinks.schema_registry_http import (HttpSchemaRegistry,
                                                   SchemaRegistryServer,
                                                   open_registry)

S1 = json.dumps({"type": "record", "name": "R",
                 "fields": [{"name": "a", "type": "long"}]})
S2 = json.dumps({"type": "record", "name": "R",
                 "fields": [{"name": "a", "type": "long"},
                            {"name": "b", "type": ["null", "string"]}]})


@pytest.fixture()
def served(tmp_path):
    with SchemaRegistryServer(str(tmp_path / "reg")) as srv:
        yield srv, HttpSchemaRegistry(srv.url)


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, json.loads(r.read()), r.headers
    except HTTPError as e:
        return e.code, json.loads(e.read()), e.headers


def test_register_resolve_versions_latest(served):
    srv, reg = served
    sid1 = reg.register("docs-value", S1)
    assert reg.register("docs-value", S1) == sid1     # idempotent
    sid2 = reg.register("docs-value", S2)
    assert sid2 != sid1
    assert reg.versions("docs-value") == [1, 2]
    assert json.loads(reg.schema_by_id(sid1)) == json.loads(S1)
    lid, lsch = reg.latest("docs-value")
    assert lid == sid2 and json.loads(lsch) == json.loads(S2)
    # raw REST surface, as a Go/Java client would call it
    code, body, hdrs = _get(f"{srv.url}/subjects")
    assert code == 200 and body == ["docs-value"]
    assert hdrs["Content-Type"].startswith(
        "application/vnd.schemaregistry.v1+json")
    code, body, _ = _get(f"{srv.url}/subjects/docs-value/versions/1")
    assert code == 200 and body["id"] == sid1 and body["version"] == 1
    code, body, _ = _get(f"{srv.url}/subjects/docs-value/versions/latest")
    assert code == 200 and body["id"] == sid2


def test_error_codes_follow_confluent_convention(served):
    srv, reg = served
    code, body, _ = _get(f"{srv.url}/subjects/nope/versions")
    assert code == 404 and body["error_code"] == 40401
    code, body, _ = _get(f"{srv.url}/schemas/ids/999")
    assert code == 404 and body["error_code"] == 40403
    reg.register("s", S1)
    code, body, _ = _get(f"{srv.url}/subjects/s/versions/7")
    assert code == 404 and body["error_code"] == 40402
    # invalid schema body → 422/42201
    req = urllib.request.Request(
        f"{srv.url}/subjects/s/versions",
        data=json.dumps({"schema": "{not json"}).encode(), method="POST")
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 422
    assert json.loads(ei.value.read())["error_code"] == 42201
    # client conveniences on missing state
    assert reg.versions("ghost") == []
    assert reg.latest("ghost") is None
    with pytest.raises(FileNotFoundError):
        reg.schema_by_id(999)


def test_lookup_post_subject(served):
    srv, reg = served
    sid = reg.register("docs-value", S1)
    req = urllib.request.Request(
        f"{srv.url}/subjects/docs-value",
        data=json.dumps({"schema": S1}).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        body = json.loads(r.read())
    assert body["id"] == sid and body["version"] == 1
    # a schema never registered under the subject → 40403
    req = urllib.request.Request(
        f"{srv.url}/subjects/docs-value",
        data=json.dumps({"schema": S2}).encode(), method="POST")
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert json.loads(ei.value.read())["error_code"] == 40403


def test_http_and_file_paths_share_one_store(tmp_path):
    root = str(tmp_path / "reg")
    with SchemaRegistryServer(root) as srv:
        http = HttpSchemaRegistry(srv.url)
        file = AvroSchemaRegistry(root)
        sid = http.register("docs-value", S1)
        # the file-backed view resolves what HTTP registered, and
        # re-registering through the OTHER path converges on the same id
        assert file.schema_by_id(sid) == json.dumps(
            json.loads(S1), sort_keys=True, separators=(",", ":"))
        assert file.register("docs-value", S1) == sid
        sid2 = file.register("docs-value", S2)
        assert http.register("docs-value", S2) == sid2
        assert open_registry(srv.url).versions("docs-value") == [1, 2]
        assert open_registry(root).versions("docs-value") == [1, 2]


def test_concurrent_registration_converges(served):
    _, reg_proto = served
    ids = []

    def worker():
        # one client per thread, as concurrent producer tasks would
        r = HttpSchemaRegistry(reg_proto.url)
        ids.append(r.register("docs-value", S1))

    ts = [threading.Thread(target=worker) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert len(set(ids)) == 1 and len(ids) == 8


def test_avro_over_wire_broker_with_registry_service(t1_fixture, tmp_path):
    """The reference's full avro deployment shape — Kafka broker + schema
    registry service, both as wire endpoints: produce_mq(protocol='avro',
    broker=..., registry='http://...') → fetch_mq → consume_mq == the
    sequential oracle. Every producer task registers over HTTP; the
    consumer's decoders resolve ids over HTTP."""
    from tiflow_ray import oracle
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.pipelines.mq import consume_mq, fetch_mq, produce_mq
    from tiflow_ray.sinks.kafka_wire import KafkaLiteBroker

    root, reg, _metas, _info = t1_fixture
    spool = str(tmp_path / "spool")
    with KafkaLiteBroker(str(tmp_path / "blog")) as b, \
            SchemaRegistryServer(str(tmp_path / "reg")) as srv:
        addr = f"{b.host}:{b.port}"
        r1 = produce_mq(os.path.join(root, "wal"), "", num_partitions=4,
                        broker=addr, topic="cf", protocol="avro",
                        schema_registry=srv.url)
        r2 = fetch_mq(addr, "cf", spool)
        assert r2["messages"] == r1["messages"]
        with open(os.path.join(spool, "meta.json")) as f:
            assert json.load(f)["registry"] == srv.url
        lake = str(tmp_path / "lake")
        res = consume_mq(spool, lake, base_dir=os.path.join(root, "base"),
                         num_partitions=8)
        got = rp.lake_to_table(lake, res["wal_dir"])
    assert got.equals(oracle.replay_to_table(root, reg))


def test_avro_broker_without_registry_rejected(t1_fixture):
    from tiflow_ray.pipelines.mq import produce_mq
    root, _reg, _metas, _info = t1_fixture
    with pytest.raises(AssertionError, match="registry"):
        produce_mq(os.path.join(root, "wal"), "", 4,
                   broker="127.0.0.1:1", protocol="avro")
