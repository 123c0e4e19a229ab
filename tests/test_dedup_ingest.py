"""Incremental corpus dedup (pipelines/dedup_ingest.py): persistent
hash-partitioned key index, epoch manifests, exactly-once across crashes,
equivalence with the batch dedup oracle."""

import glob
import os

import pandas as pd
import pyarrow as pa
import ray.data

from tiflow_ray.pipelines.dedup_ingest import (committed_epochs,
                                               index_keys, ingest_epoch)


def _docs(ids, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _text(i):
    # dedup key = first 5 words; i % 7 controls the key so epochs overlap
    return f"k{i % 7} w1 w2 w3 w4 tail{i}"


def test_incremental_equals_batch_first_occurrence(tmp_path, ray_session):
    idx = str(tmp_path / "index")
    novel = []
    chunks = [range(0, 10), range(10, 25), range(25, 40)]
    for e, ch in enumerate(chunks):
        out = ingest_epoch(_docs(list(ch), [_text(i) for i in ch]), idx,
                           epoch_id=e, num_partitions=4)
        novel.append(out.to_pandas())
    got = pd.concat(novel).sort_values("doc_id").reset_index(drop=True)
    # batch oracle: global first occurrence = min doc_id per key (epochs
    # arrive in doc_id order here)
    all_ids = list(range(0, 40))
    df = pd.DataFrame({"doc_id": all_ids,
                       "key": [f"k{i % 7} w1 w2 w3 w4" for i in all_ids]})
    want = df.groupby("key", as_index=False)["doc_id"].min() \
             .sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])   # 7 distinct keys
    assert committed_epochs(idx) == [0, 1, 2]
    assert index_keys(idx).count() == 7


def test_reingest_same_epoch_is_noop(tmp_path, ray_session):
    idx = str(tmp_path / "index")
    ds = _docs([1, 2], [_text(1), _text(2)])
    first = ingest_epoch(ds, idx, 0, num_partitions=2).to_pandas()
    assert len(first) == 2
    assert ingest_epoch(ds, idx, 0, num_partitions=2) is None
    assert committed_epochs(idx) == [0]


def test_crash_before_commit_does_not_suppress(tmp_path, ray_session):
    """A crashed (uncommitted) epoch's deltas are on disk but must NOT
    count as 'seen' — the retried epoch re-emits the same novel docs."""
    idx = str(tmp_path / "index")
    ingest_epoch(_docs([0], [_text(0)]), idx, 0, num_partitions=2)
    ds = _docs([10, 11], [_text(1), _text(2)])
    ingest_epoch(ds, idx, 1, num_partitions=2)
    # simulate crash-after-deltas-before-commit: delete the manifest only
    os.remove(os.path.join(idx, "_manifest", "epoch-000001.json"))
    assert committed_epochs(idx) == [0]
    retry = ingest_epoch(ds, idx, 1, num_partitions=2).to_pandas()
    assert sorted(retry["doc_id"]) == [10, 11]           # not suppressed
    assert committed_epochs(idx) == [0, 1]
    # and the delta chain holds exactly one file per touched partition/epoch
    for p in glob.glob(os.path.join(idx, "part=*")):
        names = sorted(os.path.basename(f)
                       for f in glob.glob(os.path.join(p, "keys-*.parquet")))
        assert names == sorted(set(names))
