"""Training-data function library: dedup recall, knn sanity, text kernels."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_recall_of_planted_dups():
    """Every 10th doc gets a one-word-appended near-dup copy (id+100000);
    MinHash-LSH + exact-Jaccard verify must recover (almost) all of them."""
    import pyarrow.parquet as pq
    from tiflow_ray.queries import q_dedup_minhash
    pairs = q_dedup_minhash(SF)
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    planted = {(int(d), int(d) + 100000) for d in ids if d % 10 == 0}
    found = set(zip(pairs["a"], pairs["b"]))
    recall = len(planted & found) / len(planted)
    assert recall >= 0.95, f"minhash recall {recall}"


def test_minhash_distributed_pair_path_matches_fast_path(monkeypatch):
    """Force the size gate to the fully distributed candidate route
    (TIFLOW_MINHASH_COLLECT_MAX=0) and require the exact same verified
    pair set as the driver-collect fast path."""
    from tiflow_ray.queries import q_dedup_minhash
    fast = q_dedup_minhash(SF)
    monkeypatch.setenv("TIFLOW_MINHASH_COLLECT_MAX", "0")
    dist = q_dedup_minhash(SF)
    f = sorted(zip(fast["a"], fast["b"]))
    d = sorted(zip(dist["a"], dist["b"]))
    assert f == d
    assert (dist["planted_recall_pct"] >= 95).all()


def test_minhash_byte_budget_forces_distributed_route(monkeypatch):
    """The small route is BYTE-bounded, not just pair-counted (r3 verdict
    #6): with a 1-byte gram budget the driver map is abandoned mid-stream
    and the distributed-join route must produce the identical pair set."""
    from tiflow_ray.queries import q_dedup_minhash
    fast = q_dedup_minhash(SF)
    monkeypatch.setenv("TIFLOW_MINHASH_COLLECT_BYTES", "1")
    forced = q_dedup_minhash(SF)
    assert sorted(zip(fast["a"], fast["b"])) == \
        sorted(zip(forced["a"], forced["b"]))
    assert (forced["planted_recall_pct"] >= 95).all()


def test_dedup_embed_screen_path_matches_exact(monkeypatch):
    """Force the size gate to the LSH screen + exact rescore route and
    compare against the exact block-nested-loop result (seeds are fixed →
    deterministic)."""
    from tiflow_ray.queries import q_dedup_embed
    exact = q_dedup_embed(SF)
    monkeypatch.setenv("TIFLOW_EMBED_EXACT_MAX", "0")
    screened = q_dedup_embed(SF)
    e = set(zip(exact["a"], exact["b"]))
    s = set(zip(screened["a"], screened["b"]))
    assert s <= e                    # rescore is exact → precision 1.0
    assert len(s & e) / max(len(e), 1) >= 0.85


def test_lsh_pair_screen_recall_on_planted_high_sim_dups():
    """The regime the screen exists for: planted near-dups at sim≈0.95,
    tau=0.9 — choose_lsh_params lands at a many-bits/many-tables point
    with a >100× compute win, and recall must still hit the target."""
    import ray.data
    from tiflow_ray.functions.similarity import (choose_lsh_params,
                                                 lsh_pair_screen,
                                                 normalize_rows)
    rng = np.random.default_rng(7)
    n, d, n_dup = 1000, 64, 80
    base = rng.standard_normal((n, d))
    dup = base[:n_dup] + 0.25 * rng.standard_normal((n_dup, d))  # sim≈0.97
    m = np.vstack([base, dup]).astype(np.float32)
    ids = np.arange(len(m), dtype=np.int64)
    ds = ray.data.from_items(
        [{"vec_id": int(i), "embedding": m[i].tolist()} for i in ids],
        override_num_blocks=8)
    pairs = lsh_pair_screen(ds, tau=0.9, target_recall=0.9).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].drop_duplicates().to_numpy()))
    # ground truth by brute force
    mn = normalize_rows(m.astype(np.float64))
    sims = mn @ mn.T
    ai, bi = np.nonzero(np.triu(sims >= 0.9, 1))
    truth = set(zip(ai.tolist(), bi.tolist()))
    assert truth, "planted dups must qualify"
    assert got <= truth              # exact rescore → precision 1.0
    assert len(got & truth) / len(truth) >= 0.9
    bits, tables = choose_lsh_params(0.9, 0.9)
    assert tables / (1 << bits) < 0.01   # >100× less pair work than exact


def test_fast_fingerprint_matches_md5_equality_structure():
    """fast=True swaps the hash fn, not the semantics: the partition of
    docs into equal-fingerprint groups must be identical to the md5 path
    (same distinct-word sets ⇒ same fp, different ⇒ different)."""
    from tiflow_ray.functions.text import Fingerprint
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a b c", "c b a a", "a b", "x y z", "z y x x"],
    })
    slow = Fingerprint()(df)["fingerprint"].to_numpy()
    fast = Fingerprint(fast=True)(df)["fingerprint"].to_numpy()

    def groups(v):
        seen = {}
        return [seen.setdefault(x, len(seen)) for x in v]
    assert groups(slow) == groups(fast) == [0, 0, 1, 2, 2]


def test_fast_hash_embed_preserves_counts():
    """Bucket assignment differs (xxhash vs md5) but each doc's total
    word count and the vectorizer shape must be identical."""
    from tiflow_ray.functions.text import HashEmbed
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["a b c a", "the quick fox"]})
    slow = HashEmbed()(df)
    fast = HashEmbed(fast=True)(df)
    assert list(slow.columns) == list(fast.columns)
    fcols = [c for c in slow.columns if c.startswith("f")]
    assert (slow[fcols].sum(axis=1) == fast[fcols].sum(axis=1)).all()
    assert fast[fcols].sum(axis=1).tolist() == [4, 3]


def test_exact_jaccard_bounds():
    from tiflow_ray.functions.dedup import exact_jaccard
    assert exact_jaccard("a b c d e", "a b c d e") == 1.0
    assert exact_jaccard("a b c d e", "x y z w v") == 0.0


def test_simhash_identical_docs_distance_zero():
    from tiflow_ray.functions.dedup import simhash64
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy dog")
    assert a == b
    c = simhash64("completely different words entirely here now")
    assert bin(a ^ c).count("1") > 0


def test_knn_self_is_top_when_included():
    import ray.data
    from tiflow_ray.functions.similarity import knn
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    out = knn(ds, [0, 1], k=5, exclude_self=False)
    # with self included, rank 1 of each query is the query itself
    r1 = out[out["rank"] == 1]
    assert list(r1["vec_id"]) == list(r1["query_id"])


def test_md5_u64_matches_duckdb():
    import duckdb
    from tiflow_ray.functions.text import md5_u64
    for s in ["abc", "", "hello world", "δοκιμή"]:
        got = md5_u64(s)
        exp = duckdb.sql("select md5_number_lower(?)", params=[s]).fetchone()[0]
        assert got == exp, s


def test_ppm_decode_resize_real_pixels():
    """The PPM tier is a REAL decoder: roundtrip non-constant pixels,
    tolerate header comments, and verify nearest-neighbor resize picks the
    exact source pixels."""
    import numpy as np

    from tiflow_ray.functions.multimodal import (decode_ppm, encode_ppm,
                                                 resize_nearest)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n16 12\n255\n" + img.tobytes()
    back = decode_ppm(payload)
    assert (back == img).all()
    small = resize_nearest(img, 4, 3)
    assert small.shape == (3, 4, 3)
    assert (small[0, 0] == img[0, 0]).all()
    assert (small[2, 3] == img[(2 * 12) // 3, (3 * 16) // 4]).all()
    # encode helper roundtrips too
    enc = encode_ppm(5, 4, (9, 8, 7))
    dec = decode_ppm(enc)
    assert dec.shape == (4, 5, 3) and (dec[..., 0] == 9).all()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_wav_decode_real_samples():
    import numpy as np

    from tiflow_ray.functions.multimodal import decode_wav, encode_wav
    s = np.array([100, -100, 5000, -32768, 32767], np.int16)
    rate, back = decode_wav(encode_wav(8000, s))
    assert rate == 8000 and (back == s).all()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_wav(b"OggS....")


def test_frame_split_and_sample():
    from tiflow_ray.functions.multimodal import (FrameSample, decode_ppm,
                                                 encode_ppm,
                                                 split_ppm_frames)
    frames = [encode_ppm(8, 6, (f * 10, 0, 0)) for f in range(5)]
    parts = split_ppm_frames(b"".join(frames))
    assert len(parts) == 5
    assert (decode_ppm(parts[3])[..., 0] == 30).all()


def test_decode_stub_contract():
    import pyarrow as pa
    from tiflow_ray.functions.multimodal import DecodeStub, to_binary_payload
    t = pa.table({"doc_id": [1, 2], "text": ["ab", "xyz"]})
    p = to_binary_payload(t)
    assert p["n_bytes"].to_pylist() == [2, 3]
    out = DecodeStub()(p)
    assert out.column_names == ["doc_id", "n_bytes", "content_hash",
                                "feat_w", "feat_h"]
    with pytest.raises(NotImplementedError):
        DecodeStub(real_decode=True)


def test_knn_lsh_recall_and_validity():
    """LSH-bucketed ANN: results must be valid ids with contiguous ranks;
    the 8-table × 6-bit × hamming-1-multiprobe operating point must hold
    ≥0.8 recall vs brute force even on uniform-random embeddings (the LSH
    worst case; seeds fixed → deterministic)."""
    from tiflow_ray.queries import q_knn_lsh, q_knn_search
    approx = q_knn_lsh(SF)
    exact = q_knn_search(SF)
    for q, grp in approx.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["vec_id"] != q).all()
    a = set(zip(approx["query_id"], approx["vec_id"]))
    e = set(zip(exact["query_id"], exact["vec_id"]))
    assert len(a & e) / len(e) >= 0.8
    assert (approx["recall_pct"] >= 80).all()
    # the no-recall variant (bench path) skips the diagnostic column
    lean = q_knn_lsh(SF, with_recall=False)
    assert "recall_pct" not in lean.columns
    assert set(zip(lean["query_id"], lean["vec_id"])) == a


def test_knn_ivf_recall_and_validity():
    """IVF ANN: valid ids, contiguous ranks, ≥0.8 per-query recall even on
    uniform-random embeddings (deterministic: fixed kmeans/query seeds)."""
    from tiflow_ray.queries import q_knn_ivf, q_knn_search
    approx = q_knn_ivf(SF)
    exact = q_knn_search(SF)
    for q, grp in approx.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["vec_id"] != q).all()
    a = set(zip(approx["query_id"], approx["vec_id"]))
    e = set(zip(exact["query_id"], exact["vec_id"]))
    assert len(a & e) / len(e) >= 0.8
    assert (approx["recall_pct"] >= 70).all()


def test_ivf_clustered_prunes_hard():
    """The regime IVF exists for: clustered corpus → tiny nprobe/cells
    scans a small fraction and still recovers the true neighbors."""
    from tiflow_ray.functions.similarity import kmeans_cosine, normalize_rows
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 32)) * 4
    x = np.vstack([c + rng.standard_normal((200, 32)) for c in centers])
    c = kmeans_cosine(x[rng.choice(len(x), 400, replace=False)], 8)
    xn = normalize_rows(x)
    assign = np.argmax(xn @ c.T, axis=1)
    # probe only the single nearest cell per query → scan ~1/8 of corpus
    recs, fracs = [], []
    for q in range(5):
        qc = np.argmax(xn[q] @ c.T)
        hit = (assign == qc)
        hit[q] = False
        cand = np.flatnonzero(hit)
        fracs.append(len(cand) / len(x))
        sims = xn[cand] @ xn[q]
        got = set(cand[np.argsort(-sims)[:10]])
        s = xn @ xn[q]
        s[q] = -2
        truth = set(np.argsort(-s)[:10])
        recs.append(len(got & truth) / 10)
    assert np.mean(fracs) < 0.25          # scans a small fraction
    assert np.mean(recs) >= 0.9           # and still finds the neighbors


def test_asof_and_sessionize_shapes():
    from tiflow_ray.queries import q_asof_join, q_sessionize
    asof = q_asof_join(SF)
    assert (asof["purchase_event_id"] != asof["click_event_id"]).all()
    sess = q_sessionize(SF)
    assert (sess["end_us"] >= sess["start_us"]).all()
    assert (sess.groupby("user_id")["session_id"].min() == 1).all()


def test_stopword_counts_matches_per_word_semantics():
    """The vectorized whole-token regex count must be bit-identical to the
    original per-word definition `sum(1 for w in text.split(" ") if
    w.lower() in STOPWORDS)` — incl. runs of adjacent stopwords, double
    spaces, punctuation-attached words and mixed case."""
    import random

    import pandas as pd

    from tiflow_ray.functions.text import STOPWORDS, stopword_counts

    def ref(t):
        return sum(1 for w in t.split(" ") if w.lower() in STOPWORDS)

    cases = ["the cat and a dog", "a a a", "of to in", "There is the.",
             "", "THE AND Of", "a  a", "x the", "the", "to-to to"]
    assert stopword_counts(pd.Series(cases)).tolist() == [ref(c) for c in cases]

    rng = random.Random(7)
    vocab = list(STOPWORDS) + ["cat", "dog", "there", "the.", "AND", "x", ""]
    rand = [" ".join(rng.choices(vocab, k=rng.randint(0, 25)))
            for _ in range(1000)]
    assert stopword_counts(pd.Series(rand)).tolist() == [ref(r) for r in rand]


def test_repetition_stats_matches_bruteforce():
    """Gopher repetition counts: vectorized kernel == Counter brute force
    on random word streams (incl. single-word and all-same docs)."""
    from collections import Counter

    import pandas as pd

    from tiflow_ray.functions.text import RepetitionStats

    rng = np.random.default_rng(13)
    vocab = ["a", "b", "c", "dd", "eee"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(80)] + ["solo", "w w w w"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = RepetitionStats()(df)
    for i, text in enumerate(texts):
        words = text.split(" ")
        wc = Counter(words)
        grams = Counter(zip(words, words[1:]))
        row = out.iloc[i]
        assert row["n_words"] == len(words)
        assert row["n_distinct"] == len(wc)
        assert row["dup_word_count"] == sum(c for c in wc.values() if c > 1)
        assert row["top_word_count"] == max(wc.values())
        assert row["n_2grams"] == max(len(words) - 1, 0)
        assert row["dup_2gram_count"] == sum(c for c in grams.values() if c > 1)
        assert row["top_2gram_count"] == (max(grams.values()) if grams else 0)
        assert row["gopher_keep"] == (
            row["dup_word_count"] * 10 < row["n_words"] * 3
            and row["top_word_count"] * 5 < row["n_words"])


def test_paragraph_dedup_first_occurrence_semantics(ray_session, tmp_path):
    """Planted boilerplate: a shared 8-word header across docs survives
    only in the lowest (doc_id, pos); a doc that is ALL duplicates
    disappears; unique tails always survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tiflow_ray import queries as Q

    header = "x0 x1 x2 x3 x4 x5 x6 x7"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            header + " a0 a1 a2 a3 a4 a5 a6 a7",
            header + " b0 b1 b2 b3 b4 b5 b6 b7",
            header,                               # pure boilerplate: dies
            "c0 c1 c2 c3 c4 c5 c6 c7",
        ]),
    })
    sf = str(tmp_path)
    pq.write_table(docs, f"{sf}/documents.parquet")
    out = Q.q_paragraph_dedup(sf).set_index("doc_id")
    assert out.loc[0, "text_dedup"] == header + " a0 a1 a2 a3 a4 a5 a6 a7"
    assert out.loc[0, "n_kept"] == 2
    assert out.loc[1, "text_dedup"] == "b0 b1 b2 b3 b4 b5 b6 b7"
    assert 2 not in out.index                     # fully deduplicated
    assert out.loc[3, "n_kept"] == 1


def test_knn_pq_recall_and_compression():
    """PQ ANN: valid ids, contiguous ranks, ≥0.85 recall via ADC +
    exact re-rank on uniform-random embeddings (the PQ worst case);
    codes are 16 bytes vs 256-byte float vectors (16×)."""
    import numpy as np

    from tiflow_ray.functions.similarity import (normalize_rows, pq_encode,
                                                 train_pq)
    from tiflow_ray.queries import q_knn_pq, q_knn_search
    approx = q_knn_pq(SF)
    exact = q_knn_search(SF)
    for q, grp in approx.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["vec_id"] != q).all()
    a = set(zip(approx["query_id"], approx["vec_id"]))
    e = set(zip(exact["query_id"], exact["vec_id"]))
    assert len(a & e) / len(e) >= 0.85
    assert (approx["recall_pct"] >= 70).all()
    lean = q_knn_pq(SF, with_recall=False)
    assert "recall_pct" not in lean.columns

    rng = np.random.default_rng(3)
    x = normalize_rows(rng.normal(size=(256, 64)))
    books = train_pq(x, m_sub=16, k=32)
    codes = pq_encode(x, books)
    assert codes.shape == (256, 16) and codes.dtype == np.uint8
    # reconstruction from codes must beat a random-code baseline
    m_sub, _, dsub = books.shape
    recon = np.concatenate([books[i][codes[:, i]]
                            for i in range(m_sub)], axis=1)
    err = np.linalg.norm(x - recon, axis=1).mean()
    rand = np.linalg.norm(
        x - np.concatenate([books[i][rng.integers(0, 32, 256)]
                            for i in range(m_sub)], axis=1), axis=1).mean()
    assert err < 0.7 * rand


def test_sequence_pack_invariants(ray_session):
    """Packing invariants: offsets are an exact ordered prefix sum
    (contiguous, gap-free), chunk spans match the token budget, and a doc
    never starts inside another doc's span."""
    import numpy as np

    from tiflow_ray.queries import q_sequence_pack
    out = q_sequence_pack(SF).sort_values("doc_id")
    start = out["start_off"].to_numpy()
    n = out["n_tok"].to_numpy()
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()      # gap-free concat
    assert (out["chunk_first"] == start // 1024).all()
    assert (out["chunk_last"] == (start + n - 1) // 1024).all()
    assert (out["off_in_chunk"] == start % 1024).all()
    assert (out["chunk_last"] >= out["chunk_first"]).all()
    total = int(start[-1] + n[-1])
    assert int(out["chunk_last"].max()) == (total - 1) // 1024


def test_lm_novelty_scoring(ray_session):
    """Docs made of reference bigrams score 0 novel; unseen-bigram docs
    score all-novel and fail the gate."""
    import numpy as np
    import pandas as pd

    from tiflow_ray.functions.text import LmNovelty
    ref_rows = pd.Series(["a b c d", "d e f"])
    _, gh = LmNovelty.bigram_hashes(ref_rows)
    scorer = LmNovelty(np.unique(gh))
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["a b c", "x y z w", "a b x y"]})
    out = scorer(df).set_index("doc_id")
    assert out.loc[0, "novel_2grams"] == 0 and bool(out.loc[0, "lm_keep"])
    assert out.loc[1, "known_2grams"] == 0 and not bool(out.loc[1, "lm_keep"])
    assert out.loc[2, "n_2grams"] == 3 and out.loc[2, "known_2grams"] == 1


def test_corpus_kmeans_lloyd_monotone_and_deterministic(ray_session):
    """Distributed Lloyd loop: the mean-cosine objective is nondecreasing
    across iterations, a rerun is bit-identical (fixed seed, ordered
    reduces), clusters are nonempty, and assignments agree with a local
    numpy replica of the same algorithm."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from tiflow_ray.functions.similarity import (assign_clusters,
                                                 corpus_kmeans,
                                                 kmeans_cosine,
                                                 normalize_rows)

    ds = ray.data.read_parquet(SF + "/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    c1, h1 = corpus_kmeans(ds, k=6, iters=4)
    c2, h2 = corpus_kmeans(ds, k=6, iters=4)
    assert h1 == h2 and np.array_equal(c1, c2)           # deterministic
    assert all(b >= a - 1e-12 for a, b in zip(h1, h1[1:]))  # monotone

    a = assign_clusters(ds, c1).to_pandas()
    assert a["cluster"].nunique() >= 2
    # local replica: same init, same updates
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    x = normalize_rows(np.stack(t.sort_values("vec_id")["embedding"]
                                .to_numpy()))
    c = kmeans_cosine(np.stack(ds.limit(4096).to_pandas()["embedding"]
                               .to_numpy()), 6, seed=11)
    for _ in range(4):
        asg = np.argmax(x @ c.T, axis=1)
        for j in range(6):
            if (asg == j).any():
                c[j] = x[asg == j].mean(axis=0)
        c = normalize_rows(c)
    # distributed partial sums reassociate float adds vs the local loop —
    # agreement to ~1e-6 is the correct expectation, not bit equality
    assert np.allclose(c, c1, atol=1e-5)


def test_minhash_band_sig_empty_batch():
    """Upstream filter stages legitimately emit 0-row blocks (ADVICE r4):
    the signature kernel must pass them through, not crash on the
    0-size reshape."""
    from tiflow_ray.functions.dedup import MinHashBandSig
    stage = MinHashBandSig(num_perm=16, bands=4)
    out = stage(pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "text": pd.Series([], dtype=object)}))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "band", "band_hash", "sig"]
    # non-empty output schema must match so Ray can union the blocks
    full = stage(pd.DataFrame({"doc_id": [1], "text": ["a b c d e f"]}))
    assert list(full.columns) == list(out.columns)
