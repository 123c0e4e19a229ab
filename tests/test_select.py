"""Unit tests for the data-selection kernels (DSIR importance signs,
distributed rank/ntile). SQL parity for the registry queries is covered
by test_queries_parity.py."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def test_dsir_signs_cross_multiplication():
    from tiflow_ray.functions.select import DSIR_BUCKETS, dsir_signs
    # bucket 0: 10 raw / 5 target (over-represented: 5/8 > 10/30)
    # bucket 1: 20 raw / 3 target (under-represented)
    p = pd.DataFrame({"b": [0, 1], "r": [10, 20], "t": [5, 3]})
    s = dsir_signs(p)
    assert len(s) == DSIR_BUCKETS
    assert s[0] == 1 and s[1] == -1
    assert (s[2:] == -1).all()  # empty buckets default to -1


def test_dsir_score_end_to_end_tiny():
    from tiflow_ray.functions.select import (DsirScore,
                                             dsir_bucket_partials,
                                             dsir_signs)
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha alpha beta", "gamma delta", "alpha beta"],
        "source": ["tgt", "raw", "raw"],
    })
    signs = dsir_signs(dsir_bucket_partials(df, ("tgt",)))
    out = DsirScore(ray.put(signs))(df)
    # doc 0 is the target itself: its grams dominate the target dist
    assert bool(out["dsir_keep"][0])
    # doc 1 shares no gram with the target: negative net score (exact
    # value depends on 256-bucket collisions, so only the sign is pinned)
    assert out["score"][1] < 0
    assert not bool(out["dsir_keep"][1])


def test_value_histogram_and_rank_buckets():
    from tiflow_ray.functions.select import rank_buckets, value_histogram
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=300).astype(np.int64)
    ids = np.arange(300, dtype=np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "v": vals}))
    hist = value_histogram(ds, "v", max_value=64)
    assert hist.sum() == 300 and hist[60] == 0

    out = rank_buckets(ds, "v", "doc_id", hist, n_buckets=4,
                       num_parts=4).to_pandas().sort_values("doc_id")
    exp = pd.DataFrame({"doc_id": ids, "v": vals}) \
        .sort_values(["v", "doc_id"]).reset_index(drop=True)
    exp["global_rank"] = np.arange(300, dtype=np.int64)
    exp["bucket"] = 4 * exp["global_rank"] // 300
    exp = exp.sort_values("doc_id")
    assert out["global_rank"].tolist() == exp["global_rank"].tolist()
    assert out["bucket"].tolist() == exp["bucket"].tolist()


def test_shuffle_positions_is_seeded_permutation():
    from tiflow_ray.functions.select import shuffle_positions
    ids = np.arange(200, dtype=np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = shuffle_positions(ds, "doc_id", seed="a") \
        .to_pandas().sort_values("doc_id")
    # exact permutation of 0..n-1
    assert sorted(out["shuffle_pos"].tolist()) == list(range(200))
    # deterministic for a seed; different for another
    again = shuffle_positions(ds, "doc_id", seed="a") \
        .to_pandas().sort_values("doc_id")
    other = shuffle_positions(ds, "doc_id", seed="b") \
        .to_pandas().sort_values("doc_id")
    assert out["shuffle_pos"].tolist() == again["shuffle_pos"].tolist()
    assert out["shuffle_pos"].tolist() != other["shuffle_pos"].tolist()


def test_value_histogram_rejects_out_of_range():
    from tiflow_ray.functions.select import value_histogram
    ds = ray.data.from_pandas(pd.DataFrame(
        {"v": np.array([1, 2, 99], np.int64)}))
    with pytest.raises(Exception):
        value_histogram(ds, "v", max_value=10)


def test_chunk_docs_batch_windows_and_overlap():
    # chunking lives in functions/pack.py; tested here with the other
    # corpus-prep kernels
    from tiflow_ray.functions.pack import chunk_docs_batch
    words = [f"w{i}" for i in range(60)]
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [" ".join(words), "a b c", " ".join(words[:32])],
    })
    out = chunk_docs_batch(df, width=32, stride=24)
    g0 = out[out["doc_id"] == 0]["chunk_text"].tolist()
    # 60 words -> 3 chunks: [0:32), [24:56), [48:60)
    assert g0 == [" ".join(words[0:32]), " ".join(words[24:56]),
                  " ".join(words[48:60])]
    assert out[out["doc_id"] == 1]["chunk_text"].tolist() == ["a b c"]
    # exactly width words -> one chunk, no phantom second window
    assert out[out["doc_id"] == 2]["chunk_text"].tolist() == \
        [" ".join(words[:32])]
