"""Property test: every encode/decode codec pair roundtrips arbitrary
semantically-valid event tables bit-exactly (M9/M10 across the full
protocol matrix — the reference's codec unit tests run a comparable
random-event matrix per protocol, e.g. pkg/sink/codec/*/codec_test.go)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tiflow_ray.model import OP_DELETE

# text payloads: printable ASCII incl. csv-hostile chars, newlines, quotes,
# commas, backslashes and some non-ASCII
_TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019 _-,;\"'\\\n\t|{}[]:/") + ["é", "汉", "🙂"]),
    min_size=0, max_size=12)

_CODECS = [
    ("csv", "encode_csv", "decode_csv_lines"),
    ("canal_json", "encode_canal_json", "decode_canal_lines"),
    ("debezium", "encode_debezium", "decode_debezium_lines"),
    ("open_protocol", "encode_open_protocol", "decode_open_protocol_lines"),
    ("maxwell", "encode_maxwell", "decode_maxwell_lines"),
    ("simple", "encode_simple", "decode_simple_lines"),
    ("avro", "encode_avro", "decode_avro"),
    ("craft", "encode_craft", "decode_craft"),
    ("mysql_binlog", "encode_mysql_binlog", "decode_mysql_binlog"),
]


@st.composite
def event_tables(draw):
    n = draw(st.integers(1, 8))
    ops = draw(st.lists(st.integers(1, 3), min_size=n, max_size=n))
    # commit_ts nondecreasing (WAL order), start_ts unique
    cts = np.cumsum(draw(st.lists(st.integers(0, 5), min_size=n,
                                  max_size=n))) + 1000
    has_img = [op != OP_DELETE for op in ops]

    def img(strategy):
        return [draw(strategy) if h else None for h in has_img]

    toks = img(st.one_of(st.none(),
                         st.lists(st.integers(-5, 2**30), max_size=4)))
    return pa.table({
        "op": pa.array(ops, pa.uint8()),
        "commit_ts": pa.array(cts.astype(np.uint64)),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64) + 1),
        "doc_id": pa.array([f"doc-{draw(st.integers(0, 99)):012d}"
                            for _ in range(n)]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "n_tok": pa.array(img(st.one_of(st.none(),
                                        st.integers(-3, 2**31 - 1))),
                          pa.int32()),
        "source": pa.array(img(st.one_of(st.none(), _TEXT)), pa.string()),
        "pre_tokens": pa.array(
            [draw(st.one_of(st.none(),
                            st.lists(st.integers(0, 9), max_size=3)))
             if op == 2 else None for op in ops], pa.list_(pa.int32())),
        "new_doc_id": pa.array([None] * n, pa.string()),
        "schema_ver": pa.array(draw(st.lists(st.integers(1, 4),
                                             min_size=n, max_size=n)),
                               pa.int32()),
    })


@settings(max_examples=30, deadline=None)
@given(t=event_tables())
def test_all_codecs_roundtrip_random_events(t):
    from tiflow_ray.sources import codecs as C
    cols = list(t.column_names)
    for name, enc_name, dec_name in _CODECS:
        enc, dec = getattr(C, enc_name), getattr(C, dec_name)
        blob = enc(t)
        if name == "csv":
            blob = blob[0]                       # (text, columns) tuple
        if isinstance(blob, bytes):              # binary codecs
            back = dec(blob, cols)
        else:
            back = dec(blob.splitlines(), cols)
        assert back.equals(t), (
            f"{name} roundtrip diverged\nexpected:\n{t.to_pandas()}\n"
            f"got:\n{back.to_pandas()}")
