"""Incremental corpus dedup (pipelines/dedup_ingest.py): persistent
hash-partitioned key index, epoch manifests, exactly-once across crashes,
equivalence with the batch dedup oracle."""

import glob
import os

import numpy as np
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


class TestMinhashIngest:
    """Incremental NEAR-dup dedup vs the persistent MinHash band index."""

    @staticmethod
    def _docs(ids, texts):
        import ray.data
        return ray.data.from_pandas(pd.DataFrame(
            {"doc_id": np.asarray(ids, np.int64), "text": texts}))

    @staticmethod
    def _text(i, words=30):
        rng = np.random.default_rng(i)
        return " ".join(f"w{v}" for v in rng.integers(0, 5000, words))

    def test_near_dups_within_and_across_epochs(self, tmp_path):
        from tiflow_ray.pipelines.dedup_ingest import minhash_ingest_epoch
        idx = str(tmp_path / "mh_idx")
        base = [self._text(i) for i in range(40)]
        # epoch 1: 40 originals + near-copies of every 4th (one word
        # appended) — copies must be flagged, originals kept
        ids1 = list(range(40)) + [1000 + i for i in range(0, 40, 4)]
        txt1 = base + [base[i] + " zzq" for i in range(0, 40, 4)]
        v1 = minhash_ingest_epoch(self._docs(ids1, txt1), idx, 1,
                                  num_partitions=4).to_pandas()
        v1 = v1.set_index("doc_id")["is_dup"]
        assert not v1.loc[range(40)].any(), "an original was flagged"
        copies = [1000 + i for i in range(0, 40, 4)]
        recall = v1.loc[copies].mean()
        assert recall >= 0.9, f"epoch-1 near-dup recall {recall}"

        # epoch 2: exact re-sends of epoch-1 docs + perturbed copies +
        # genuinely fresh docs
        ids2 = [2000 + i for i in range(10)] \
            + [3000 + i for i in range(10)] \
            + [4000 + i for i in range(10)]
        txt2 = [base[i] for i in range(10)] \
            + [base[10 + i] + " qqz" for i in range(10)] \
            + [self._text(9000 + i) for i in range(10)]
        v2 = minhash_ingest_epoch(self._docs(ids2, txt2), idx, 2,
                                  num_partitions=4).to_pandas()
        v2 = v2.set_index("doc_id")["is_dup"]
        assert v2.loc[[2000 + i for i in range(10)]].all(), \
            "exact re-send not flagged against the index"
        r2 = v2.loc[[3000 + i for i in range(10)]].mean()
        assert r2 >= 0.9, f"cross-epoch near-dup recall {r2}"
        assert not v2.loc[[4000 + i for i in range(10)]].any(), \
            "fresh doc falsely flagged"

    def test_idempotent_and_crash_resume(self, tmp_path):
        import json as _json

        from tiflow_ray.pipelines.dedup_ingest import (_manifest_path,
                                                       minhash_ingest_epoch)
        idx = str(tmp_path / "mh_idx2")
        docs = self._docs(list(range(20)),
                          [self._text(i) for i in range(20)])
        v1 = minhash_ingest_epoch(docs, idx, 1, num_partitions=4) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        # committed epoch id → no-op
        assert minhash_ingest_epoch(docs, idx, 1, num_partitions=4) is None
        # crash-sim: drop the manifest (deltas remain), re-run → identical
        os.remove(_manifest_path(idx, 1))
        v1b = minhash_ingest_epoch(docs, idx, 1, num_partitions=4) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert v1.equals(v1b), "crashed-epoch retry diverged"
        with open(_manifest_path(idx, 1)) as f:
            assert _json.load(f)["docs"] == 20


class TestEmbedIngest:
    """Incremental embedding near-dup dedup vs the persistent LSH index."""

    @staticmethod
    def _vecs(ids, mat):
        import ray.data
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(list(ids), pa.int64()),
            "embedding": pa.array([[float(v) for v in row] for row in mat],
                                  pa.list_(pa.float32()))}))

    def test_near_dups_across_epochs(self, tmp_path):
        from tiflow_ray.pipelines.dedup_ingest import embed_ingest_epoch
        rng = np.random.default_rng(5)
        idx = str(tmp_path / "emb_idx")
        d = 32
        base = rng.standard_normal((60, d))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        v1 = embed_ingest_epoch(self._vecs(range(60), base), idx, 1,
                                num_partitions=4, tau=0.9).to_pandas()
        assert not v1["is_dup"].any(), "epoch-1 false positive"

        # epoch 2: slightly-perturbed copies of 20 vectors (cos ≈ 0.995)
        # + 20 fresh random vectors (cos ≈ 0 in d=32)
        pert = base[:20] + 0.05 * rng.standard_normal((20, d))
        fresh = rng.standard_normal((20, d))
        ids2 = [1000 + i for i in range(20)] + [2000 + i for i in range(20)]
        v2 = embed_ingest_epoch(self._vecs(ids2, np.vstack([pert, fresh])),
                                idx, 2, num_partitions=4, tau=0.9) \
            .to_pandas().set_index("vec_id")["is_dup"]
        recall = v2.loc[[1000 + i for i in range(20)]].mean()
        assert recall >= 0.9, f"cross-epoch embed recall {recall}"
        assert not v2.loc[[2000 + i for i in range(20)]].any(), \
            "fresh vector falsely flagged"
        # idempotence: committed epoch id → no-op
        assert embed_ingest_epoch(self._vecs(ids2, np.vstack(
            [pert, fresh])), idx, 2, num_partitions=4, tau=0.9) is None


def test_compact_index_bounds_chain_and_preserves_verdicts(tmp_path,
                                                           ray_session):
    """VERDICT r4 #1: 20+ ingest epochs with periodic compact_index — the
    per-partition file count stays bounded (one base + deltas since the
    last fold), and verdicts equal an uncompacted twin's."""
    from tiflow_ray.pipelines.dedup_ingest import compact_index

    idx_c = str(tmp_path / "compacted")
    idx_u = str(tmp_path / "uncompacted")
    got_c, got_u = [], []
    for e in range(22):
        ids = list(range(e * 5, e * 5 + 5))
        txt = [_text(i) for i in ids]
        got_c.append(ingest_epoch(_docs(ids, txt), idx_c, e,
                                  num_partitions=4).to_pandas())
        got_u.append(ingest_epoch(_docs(ids, txt), idx_u, e,
                                  num_partitions=4).to_pandas())
        if e % 4 == 3:
            res = compact_index(idx_c)
            assert res["horizon"] == e
    a = pd.concat(got_c).sort_values("doc_id").reset_index(drop=True)
    b = pd.concat(got_u).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b), "compaction changed dedup verdicts"
    # chain bounded: ≤ 1 base + (epochs since last fold) deltas per part
    for p in glob.glob(os.path.join(idx_c, "part=*")):
        files = glob.glob(os.path.join(p, "keys-*.parquet"))
        assert len(files) <= 1 + 2, f"{p} chain not folded: {files}"
    # uncompacted twin really does grow a chain (the thing we're fixing)
    grew = max(len(glob.glob(os.path.join(p, "keys-*.parquet")))
               for p in glob.glob(os.path.join(idx_u, "part=*")))
    assert grew > 3
    # audits see the same key set through the base
    assert index_keys(idx_c).count() == index_keys(idx_u).count()


def test_compact_index_crash_before_commit_is_invisible(tmp_path,
                                                        ray_session):
    """A base file without its compact-*.json manifest must be ignored by
    readers, and a compact_index re-run converges (same protocol as the
    epoch manifests)."""
    from tiflow_ray.pipelines.dedup_ingest import (compact_horizon,
                                                   compact_index)

    idx = str(tmp_path / "idx")
    for e in range(3):
        ids = list(range(e * 5, e * 5 + 5))
        ingest_epoch(_docs(ids, [_text(i) for i in ids]), idx, e,
                     num_partitions=2)
    n_before = index_keys(idx).count()
    compact_index(idx)
    # crash-sim: drop the commit manifest; bases remain, deltas are gone —
    # that ordering cannot happen live (delete runs after commit), so put
    # the deltas back by re-ingesting nothing and instead verify the
    # weaker live invariant: an UNCOMMITTED base is invisible
    os.remove(os.path.join(idx, "_manifest", "compact-000002.json"))
    assert compact_horizon(idx) == -1
    # a retried compaction recommits and readers converge
    res = compact_index(idx)
    assert res["horizon"] == 2
    assert compact_horizon(idx) == 2
    assert index_keys(idx).count() == n_before
    # next epoch reads through the base: a re-sent key is suppressed
    out = ingest_epoch(_docs([900], [_text(0)]), idx, 7,
                       num_partitions=2).to_pandas()
    assert len(out) == 0, "compacted base failed to suppress a seen key"


def test_minhash_keep_only_trims_dup_rows(tmp_path, ray_session):
    """keep_only (default): dup docs' band rows are trimmed from the
    epoch delta after verdicts; a later near-copy still matches via the
    retained winner; keep_only=False retains everything."""
    from tiflow_ray.pipelines.dedup_ingest import minhash_ingest_epoch

    def rows_in(idx):
        files = glob.glob(os.path.join(idx, "part=*", "bands-*.parquet"))
        import pyarrow.parquet as pq
        return sum(pq.read_metadata(f).num_rows for f in files)

    mk = TestMinhashIngest
    base = [mk._text(i) for i in range(20)]
    ids1 = list(range(20)) + [1000 + i for i in range(20)]
    txt1 = base + [t + " zzq" for t in base]          # 20 near-copies

    idx_k = str(tmp_path / "keep")
    idx_f = str(tmp_path / "full")
    v_k = minhash_ingest_epoch(mk._docs(ids1, txt1), idx_k, 1,
                               num_partitions=4).to_pandas()
    v_f = minhash_ingest_epoch(mk._docs(ids1, txt1), idx_f, 1,
                               num_partitions=4,
                               keep_only=False).to_pandas()
    # same verdicts either way (trim happens after verdicts)
    assert v_k.sort_values("doc_id").reset_index(drop=True).equals(
        v_f.sort_values("doc_id").reset_index(drop=True))
    n_dup = int(v_k["is_dup"].sum())
    assert n_dup >= 18, f"fixture: only {n_dup} copies flagged"
    # the trimmed index holds ~half the rows
    assert rows_in(idx_k) == rows_in(idx_f) - n_dup * 8  # 8 bands/doc
    # transitivity: a near-copy of a TRIMMED dup still matches its winner
    v2 = minhash_ingest_epoch(
        mk._docs([5000 + i for i in range(20)],
                 [t + " zzq" for t in base]), idx_k, 2,
        num_partitions=4).to_pandas()
    assert v2["is_dup"].mean() >= 0.9, "winner transitivity broke recall"
    # crash-retry determinism with the trim in the loop
    from tiflow_ray.pipelines.dedup_ingest import _manifest_path
    os.remove(_manifest_path(idx_k, 2))
    v2b = minhash_ingest_epoch(
        mk._docs([5000 + i for i in range(20)],
                 [t + " zzq" for t in base]), idx_k, 2,
        num_partitions=4).to_pandas()
    assert v2.sort_values("doc_id").reset_index(drop=True).equals(
        v2b.sort_values("doc_id").reset_index(drop=True))


def test_compact_index_folds_band_and_lsh_chains(tmp_path, ray_session):
    """compact_index handles all three index kinds; minhash verdicts are
    unchanged across a fold."""
    from tiflow_ray.pipelines.dedup_ingest import (compact_index,
                                                   minhash_ingest_epoch)
    mk = TestMinhashIngest
    idx = str(tmp_path / "mh")
    for e in range(1, 5):
        ids = [e * 100 + i for i in range(10)]
        minhash_ingest_epoch(mk._docs(ids, [mk._text(i) for i in ids]),
                             idx, e, num_partitions=4)
    res = compact_index(idx)
    assert res["horizon"] == 4 and res["folded_files"] > 0
    for p in glob.glob(os.path.join(idx, "part=*")):
        deltas = glob.glob(os.path.join(p, "bands-[0-9]*.parquet"))
        deltas = [f for f in deltas if "-base-" not in f]
        assert not deltas, f"unfolded deltas remain in {p}"
    # an exact re-send after the fold is still caught (reads the base)
    v = minhash_ingest_epoch(
        mk._docs([9000], [mk._text(101)]), idx, 9,
        num_partitions=4).to_pandas()
    assert bool(v["is_dup"].iloc[0]), "base rows not consulted post-fold"


def test_embed_keep_only_trims_dup_rows(tmp_path, ray_session):
    """Embedding twin of the MinHash keep-only trim: dup vectors' LSH
    rows leave the epoch delta after verdicts; a later near-copy still
    matches via the retained winner."""
    from tiflow_ray.pipelines.dedup_ingest import embed_ingest_epoch

    def rows_in(idx):
        import pyarrow.parquet as _pq
        return sum(_pq.read_metadata(f).num_rows for f in
                   glob.glob(os.path.join(idx, "part=*", "lsh-*.parquet")))

    mk = TestEmbedIngest
    rng = np.random.default_rng(9)
    d = 32
    base = rng.standard_normal((40, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pert = base + 0.03 * rng.standard_normal((40, d))   # cos ≈ 0.998
    ids = list(range(40)) + [1000 + i for i in range(40)]
    mat = np.vstack([base, pert])

    idx_k = str(tmp_path / "keep")
    idx_f = str(tmp_path / "full")
    v_k = embed_ingest_epoch(mk._vecs(ids, mat), idx_k, 1,
                             num_partitions=4, tau=0.9).to_pandas()
    v_f = embed_ingest_epoch(mk._vecs(ids, mat), idx_f, 1,
                             num_partitions=4, tau=0.9,
                             keep_only=False).to_pandas()
    assert v_k.sort_values("vec_id").reset_index(drop=True).equals(
        v_f.sort_values("vec_id").reset_index(drop=True))
    n_dup = int(v_k["is_dup"].sum())
    assert n_dup >= 36, f"fixture: only {n_dup} planted dups flagged"
    assert rows_in(idx_k) < rows_in(idx_f)
    # transitivity: near-copies of TRIMMED dups still match winners
    pert2 = base + 0.03 * rng.standard_normal((40, d))
    v2 = embed_ingest_epoch(
        mk._vecs([5000 + i for i in range(40)], pert2), idx_k, 2,
        num_partitions=4, tau=0.9).to_pandas()
    assert v2["is_dup"].mean() >= 0.9, "winner transitivity broke recall"
