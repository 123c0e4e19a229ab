"""MQ (message-queue) sink: partition dispatch + per-partition ordered
canal-json message stream — the analog of the reference's MQ sink chain
(cdc/sink/dmlsink/mq/: dispatcher → encoder → worker).

Semantics mirrored:
- dispatchers (mq/dispatcher/partition/*.go): "key" (stable hash of the
  handle key — the default, keeps all events of one key in one partition),
  "index-value" (numeric key suffix % P — deterministic and
  SQL-expressible, used by the oracle-checked query), "ts" (commit_ts % P),
  "table" (everything to partition 0).
- per-partition ordering: messages are emitted in (commit_ts, start_ts,
  op) order with dense offsets — the per-key ordering guarantee a consumer
  relies on (all of a key's events share a partition under key/index-value
  dispatch, and are offset-ordered within it).
- payload: canal-json / open-protocol text (sources/codecs.py encoders)
  or Confluent-framed avro binary via the file-backed schema registry
  (sinks/avro_registry.py — the pkg/sink/codec/avro path), one message
  per event.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..model import key_hash64, sort_events_table


def dispatch(t: pa.Table, num_partitions: int,
             dispatcher: str = "key") -> pa.Table:
    """Append the mq_partition column per the chosen dispatcher."""
    if dispatcher == "key":
        part = (key_hash64(t["doc_id"]) % np.uint64(num_partitions))
    elif dispatcher == "index-value":
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        nums = np.array([int(s.rsplit("-", 1)[-1]) for s in ids], np.int64)
        part = nums % num_partitions
    elif dispatcher == "ts":
        part = (t["commit_ts"].to_numpy(zero_copy_only=False)
                % np.uint64(num_partitions))
    elif dispatcher == "table":
        part = np.zeros(t.num_rows, np.int64)
    else:
        raise ValueError(f"unknown dispatcher {dispatcher}")
    return t.append_column("mq_partition",
                           pa.array(part.astype(np.int32)))


class MqSinkStage:
    """map_groups callable for groupby("mq_partition"): one partition's
    events → (mq_partition, offset, key, payload) message rows, offsets
    dense in the event total order."""

    def __init__(self, database: str = "tiflow", table: str = "documents",
                 protocol: str = "canal_json",
                 registry_root: str | None = None,
                 max_message_bytes: int | None = None,
                 large_handle: str = "none",
                 claim_dir: str | None = None):
        assert protocol in ("canal_json", "open_protocol", "avro"), protocol
        if protocol == "avro":
            assert registry_root, "avro protocol needs a schema registry"
        # large-message handling (pkg/config/large_message.go): "none" =
        # reject oversize loudly (the broker would anyway); "handle_key_only"
        # = oversize messages carry only the handle key + event identity,
        # the consumer re-fetches the row from upstream (the WAL here, TiKV
        # in the reference); "claim_check" = oversize payloads land in the
        # claim-check store and a pointer message rides the topic.
        assert large_handle in ("none", "handle_key_only", "claim_check"),             large_handle
        if large_handle == "claim_check":
            assert claim_dir, "claim_check needs claim_dir (storage uri)"
        if large_handle == "handle_key_only":
            assert protocol != "avro",                 "handle_key_only is a text-protocol option (like the "                 "reference: canal-json / open-protocol)"
        self.database, self.table, self.protocol = database, table, protocol
        self.registry_root = registry_root
        self.max_message_bytes = max_message_bytes
        self.large_handle = large_handle
        self.claim_dir = claim_dir
        self._schema_cache: dict[str, tuple[int, str]] = {}

    def _avro_payloads(self, ev: pa.Table) -> pa.Array:
        """Register the value schema (idempotent — every worker may race
        on the shared registry, same-schema registrations converge on
        one id) and emit one Confluent-framed binary datum per event.
        `registry_root` is a registry SPEC: an http:// URL talks to the
        REST registry service (schema_registry_http.py), a plain path is
        the shared-directory store — both back the same layout."""
        from ..sources.codecs import _avro_schema_json
        from .avro_registry import encode_avro_messages
        from .schema_registry_http import open_registry
        schema_json = _avro_schema_json(list(ev.column_names), ev.schema)
        if schema_json not in self._schema_cache:
            reg = open_registry(self.registry_root)
            subject = f"{self.database}.{self.table}-value"
            self._schema_cache[schema_json] = (
                reg.register(subject, schema_json), schema_json)
        sid, sj = self._schema_cache[schema_json]
        return pa.array(encode_avro_messages(ev, sid, sj), pa.binary())

    def ddl_stream(self, registry, num_partitions: int) -> pa.Table:
        """DDL broadcast messages (cdc/sink/ddlsink/mq analog): every
        partition receives the full DDL sequence as canal-json isDdl
        messages in its own dense DDL-offset space, so each partition's
        consumer observes every barrier regardless of which keys it
        holds."""
        from ..sources.codecs import encode_canal_ddl
        assert self.protocol == "canal_json", \
            "DDL messages are canal-json only"
        lines = encode_canal_ddl(registry, self.database,
                                 self.table).splitlines()
        k = len(lines)
        return pa.table({
            "mq_partition": pa.array(np.repeat(
                np.arange(num_partitions, dtype=np.int32), k)),
            "offset": pa.array(np.tile(np.arange(k, dtype=np.int64),
                                       num_partitions)),
            "key": pa.array(["__ddl__"] * (k * num_partitions)),
            "payload": pa.array(lines * num_partitions, pa.string()),
        })

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sources.codecs import encode_canal_json, encode_open_protocol
        part = int(t["mq_partition"][0].as_py()) if t.num_rows else -1
        ev = sort_events_table(t.drop_columns(["mq_partition"]),
                               with_doc=False)
        if self.protocol == "avro":
            payload = self._avro_payloads(ev)
        else:
            enc = (encode_open_protocol if self.protocol == "open_protocol"
                   else encode_canal_json)
            payload = pa.array(enc(ev, self.database,
                                   self.table).splitlines(), pa.string())
        n = len(payload)
        if self.max_message_bytes is not None and n:
            payload = self._handle_large(ev, payload, part)
        return pa.table({
            "mq_partition": pa.array(np.full(n, part, np.int32)),
            "offset": pa.array(np.arange(n, dtype=np.int64)),
            "key": ev["doc_id"],
            "payload": payload,
        })

    def _handle_large(self, ev: pa.Table, payload: pa.Array,
                      part: int) -> pa.Array:
        """Apply the configured large-message option to oversize payloads
        (offset within the partition = row index — offsets are assigned
        dense right after this, so claim filenames are deterministic and
        crashed-task retries overwrite identical bytes)."""
        import json as _json
        import os as _os

        import pyarrow.compute as pc
        sizes = pc.binary_length(
            payload if payload.type in (pa.binary(), pa.large_binary())
            else payload.cast(pa.binary())).to_numpy(zero_copy_only=False)
        big = np.flatnonzero(sizes > self.max_message_bytes)
        if len(big) == 0:
            return payload
        if self.large_handle == "none":
            key0 = ev["doc_id"][int(big[0])].as_py()
            raise ValueError(
                f"{len(big)} message(s) exceed max_message_bytes="
                f"{self.max_message_bytes} (first key {key0!r}); configure "
                "large_handle='handle_key_only' or 'claim_check' "
                "(pkg/config/large_message.go options)")
        vals = payload.to_pylist()
        ops = ev["op"].to_numpy(zero_copy_only=False)
        cts = ev["commit_ts"].to_numpy(zero_copy_only=False)
        sts = ev["start_ts"].to_numpy(zero_copy_only=False)
        ids = ev["doc_id"].to_numpy(zero_copy_only=False)
        for i in big:
            i = int(i)
            if self.large_handle == "handle_key_only":
                vals[i] = _json.dumps(
                    {"onlyHandleKey": True, "op": int(ops[i]),
                     "commit_ts": int(cts[i]), "start_ts": int(sts[i]),
                     "doc_id": str(ids[i])})
            else:                           # claim_check
                _os.makedirs(self.claim_dir, exist_ok=True)
                name = f"part{part:05d}-off{i:012d}.msg"
                dst = _os.path.join(self.claim_dir, name)
                data = vals[i] if isinstance(vals[i], (bytes, bytearray)) \
                    else vals[i].encode()
                tmp = dst + f".tmp.{_os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(data)
                _os.replace(tmp, dst)
                loc = _json.dumps({"claimCheckLocation": dst})
                vals[i] = loc.encode() if isinstance(vals[i],
                                                     (bytes, bytearray)) \
                    else loc
        if isinstance(vals[0], (bytes, bytearray)):
            return pa.array(vals, pa.binary())
        return pa.array(vals, pa.string())


@dataclass(frozen=True)
class DispatchRule:
    """One [sink.dispatchers] entry (config.DispatchRule): a table-filter
    matcher + partition rule + topic expression."""
    matcher: tuple[str, ...]
    partition: str = "default"     # default|table|key|index-value|ts
    topic: str = ""                # "" = default topic; {schema}/{table} subst

    def __post_init__(self):
        assert self.partition in ("default", "table", "key",
                                  "index-value", "ts"), self.partition


class EventRouter:
    """Topic + partition router (cdc/sink/dmlsink/mq/dispatcher/
    event_router.go:30-130): rules walked in order, FIRST rule whose
    table-filter matches wins; a `*.*` default rule (default dispatcher,
    static default topic) is appended so unmatched tables always route
    (event_router.go:48-53). `default` partitioning = the table
    dispatcher (all events of one table share a partition via a stable
    hash of schema.table). Routing is resolved once per DISTINCT
    (schema, table) pair per batch; per-row partition math is vectorized."""

    def __init__(self, rules: list[DispatchRule], default_topic: str,
                 case_sensitive: bool = False):
        from ..stages.table_filter import TableFilter
        self.default_topic = default_topic
        all_rules = list(rules) + [DispatchRule(("*.*",), "default", "")]
        self.rules = [(TableFilter(list(r.matcher), case_sensitive), r)
                      for r in all_rules]

    def route(self, schema: str, table: str) -> tuple[str, str]:
        """(topic, partition_rule) for one table — first match wins."""
        for filt, rule in self.rules:
            if filt.match(schema, table):
                topic = rule.topic or self.default_topic
                topic = topic.replace("{schema}", schema).replace(
                    "{table}", table)
                part = "table" if rule.partition == "default" else rule.partition
                return topic, part
        raise AssertionError("unreachable: the *.* default always matches")

    def route_batch(self, t: pa.Table, num_partitions: int,
                    schema_col: str = "schema_name",
                    table_col: str = "table_name") -> pa.Table:
        """Append mq_topic + mq_partition columns."""
        SEP = "\x1f"
        schemas = np.asarray(t[schema_col].to_numpy(zero_copy_only=False))
        tables = np.asarray(t[table_col].to_numpy(zero_copy_only=False))
        pairs = np.char.add(np.char.add(schemas.astype(str), SEP),
                            tables.astype(str))
        uniq, inv = np.unique(pairs, return_inverse=True)
        topics = np.empty(len(uniq), object)
        prules = np.empty(len(uniq), object)
        table_part = np.empty(len(uniq), np.int64)
        for i, u in enumerate(uniq):
            s, tb = u.split(SEP, 1)
            topics[i], prules[i] = self.route(s, tb)
            table_part[i] = int(
                key_hash64(pa.array([f"{s}.{tb}"]))[0]
                % np.uint64(num_partitions))
        row_rule = prules[inv]
        part = table_part[inv].copy()          # "table" default everywhere
        if (row_rule == "key").any():
            kp = (key_hash64(t["doc_id"]) % np.uint64(num_partitions)
                  ).astype(np.int64)
            part = np.where(row_rule == "key", kp, part)
        if (row_rule == "index-value").any():
            ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
            nums = np.array([int(s.rsplit("-", 1)[-1]) for s in ids],
                            np.int64)
            part = np.where(row_rule == "index-value",
                            nums % num_partitions, part)
        if (row_rule == "ts").any():
            tp = (t["commit_ts"].to_numpy(zero_copy_only=False)
                  % np.uint64(num_partitions)).astype(np.int64)
            part = np.where(row_rule == "ts", tp, part)
        return (t.append_column("mq_topic",
                                pa.array(topics[inv], pa.string()))
                 .append_column("mq_partition",
                                pa.array(part.astype(np.int32))))
