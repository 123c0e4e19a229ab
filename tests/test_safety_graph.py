"""Unit tests for the safety kernels (PII redaction, benchmark
decontamination) and the distributed connected-components operator.
End-to-end SQL parity for the three registry queries is covered by
test_queries_parity.py; these pin the kernel-level semantics."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def test_pii_redact_counts_and_scrub():
    from tiflow_ray.functions.safety import pii_redact_batch
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail a.b-c%d@sub.host.org now",
            "ip 10.0.0.1 and 255.255.255.255 end",
            "call 555-123-4567 or 555-000-1111",
            "nothing here",
        ],
    })
    out = pii_redact_batch(df)
    assert out["n_emails"].tolist() == [1, 0, 0, 0]
    assert out["n_ips"].tolist() == [0, 2, 0, 0]
    assert out["n_phones"].tolist() == [0, 0, 2, 0]
    assert out["clean_text"].tolist() == [
        "mail <EMAIL> now",
        "ip <IP> and <IP> end",
        "call <PHONE> or <PHONE>",
        "nothing here",
    ]


def test_pii_regex_dialect_parity_with_duckdb():
    """The three patterns must mean the same thing to Python re and
    DuckDB's RE2 — checked on adversarial strings (dots, boundaries,
    partial matches)."""
    import duckdb
    from tiflow_ray.functions.safety import (EMAIL_SQL, IPV4_SQL, PHONE_SQL,
                                             pii_redact_batch)
    texts = [
        "x@y.zz a@b.c 1.2.3.4.5 12.34.56.78 555-12-3456 999-999-9999",
        "a_b%c@d-e.fg.hh tail 1.2.3.4x 0.0.0.0 555-555-5555x",
        "no pii at all",
        "@nope.com user@@double.com 1..2.3.4",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = pii_redact_batch(df)
    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT len(regexp_extract_all(t, '{EMAIL_SQL}')) AS n_emails,
               len(regexp_extract_all(t, '{IPV4_SQL}')) AS n_ips,
               len(regexp_extract_all(t, '{PHONE_SQL}')) AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(t,
                   '{EMAIL_SQL}', '<EMAIL>', 'g'),
                   '{IPV4_SQL}', '<IP>', 'g'),
                   '{PHONE_SQL}', '<PHONE>', 'g') AS clean_text
        FROM (SELECT unnest(?) AS t)""", [texts]).df()
    assert got["n_emails"].tolist() == exp["n_emails"].tolist()
    assert got["n_ips"].tolist() == exp["n_ips"].tolist()
    assert got["n_phones"].tolist() == exp["n_phones"].tolist()
    assert got["clean_text"].tolist() == exp["clean_text"].tolist()


def test_decontaminate_flags_spliced_docs():
    from tiflow_ray.functions.safety import Decontaminate, bench_shingles
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ref = ray.put(bench_shingles(pd.Series([bench_text]), k=8))
    clean = "one two three four five six seven eight nine ten eleven"
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            clean,
            clean + " " + bench_text,          # contains bench 8-grams
            "short doc",                        # < 8 words: whole-doc hash
        ],
    })
    out = Decontaminate(ref, k=8)(df)
    assert out["contaminated"].tolist() == [False, True, False]
    # 10-word bench text has 3 8-grams; all reappear in doc 1's suffix
    assert out["n_overlap"].tolist()[1] >= 3
    assert out["n_shingles"].tolist()[2] == 1  # short-doc fallback


def _cc(edge_list, node_list, **kw):
    from tiflow_ray.functions.graph import connected_components
    edges = ray.data.from_pandas(pd.DataFrame(
        {"a": np.array([a for a, _ in edge_list], np.int64),
         "b": np.array([b for _, b in edge_list], np.int64)}))
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"node": np.array(node_list, np.int64)}))
    kw.setdefault("num_parts", 2)   # tiny graphs: shrink sort overhead
    out = connected_components(edges, nodes, **kw).to_pandas()
    return dict(zip(out["node"], out["cluster"]))


def test_connected_components_basic():
    # two chains + an isolated node; transitivity across the chain
    lab = _cc([(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99])
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_path_graph_log_rounds():
    # a 64-node path is the worst case for plain propagation (diameter
    # 63); the pointer hop must close it in O(log n) rounds
    n = 64
    lab = _cc([(i, i + 1) for i in range(n - 1)], list(range(n)),
              max_rounds=14)
    assert set(lab.values()) == {0}


def _union_find_oracle(edge_list, node_list):
    parent = {n: n for n in node_list}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    roots = {}
    for n in node_list:
        r = find(n)
        roots.setdefault(r, []).append(n)
    return {n: min(ns) for r, ns in roots.items() for n in ns}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_random_graphs_match_union_find(seed):
    rng = np.random.default_rng(seed)
    n = 200
    nodes = list(range(n))
    m = 250
    edges = list(zip(rng.integers(0, n, m).tolist(),
                     rng.integers(0, n, m).tolist()))
    edges = [(a, b) for a, b in edges if a != b]   # drop self loops
    got = _cc(edges, nodes)
    assert got == _union_find_oracle(edges, nodes)


def test_attach_cluster_sizes():
    from tiflow_ray.functions.graph import (attach_cluster_sizes,
                                            connected_components)
    edges = ray.data.from_pandas(pd.DataFrame(
        {"a": np.array([1, 2], np.int64), "b": np.array([2, 3], np.int64)}))
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"node": np.array([1, 2, 3, 7], np.int64)}))
    out = attach_cluster_sizes(
        connected_components(edges, nodes, num_parts=2), num_parts=2) \
        .to_pandas().sort_values("node")
    assert out["cluster"].tolist() == [1, 1, 1, 7]
    assert out["cluster_size"].tolist() == [3, 3, 3, 1]


def test_pii_regex_parity_fuzz():
    """Fuzz the re∩RE2 dialect claim: counts and redacted text must agree
    between pandas/re and DuckDB/RE2 on adversarial random strings."""
    import duckdb
    from tiflow_ray.functions.safety import (EMAIL_SQL, IPV4_SQL,
                                             PHONE_SQL, pii_redact_batch)
    rng = np.random.default_rng(11)
    alphabet = list("ab1. @-%_") + ["555-", "@x.io", "1.2.3.4", "12",
                                    "9.9.9.999", "000-000-0000", ".com"]
    texts = ["".join(rng.choice(alphabet, size=rng.integers(1, 30)))
             for _ in range(200)]
    got = pii_redact_batch(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT len(regexp_extract_all(t, '{EMAIL_SQL}')) AS n_emails,
               len(regexp_extract_all(t, '{IPV4_SQL}')) AS n_ips,
               len(regexp_extract_all(t, '{PHONE_SQL}')) AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(t,
                   '{EMAIL_SQL}', '<EMAIL>', 'g'),
                   '{IPV4_SQL}', '<IP>', 'g'),
                   '{PHONE_SQL}', '<PHONE>', 'g') AS clean_text
        FROM (SELECT unnest(?) AS t)""", [texts]).df()
    assert got["n_emails"].tolist() == exp["n_emails"].tolist()
    assert got["n_ips"].tolist() == exp["n_ips"].tolist()
    assert got["n_phones"].tolist() == exp["n_phones"].tolist()
    assert got["clean_text"].tolist() == exp["clean_text"].tolist()


def test_decontaminate_matches_bruteforce_oracle():
    """Random word-soup texts: n_overlap/contaminated must equal a plain
    Python shingle-set oracle (same k, same whole-doc fallback)."""
    from tiflow_ray.functions.safety import Decontaminate, bench_shingles
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    def mk(n): return " ".join(rng.choice(vocab, size=n))
    bench_texts = [mk(rng.integers(3, 20)) for _ in range(5)]
    texts = [mk(rng.integers(1, 25)) for _ in range(60)]
    k = 8

    def sh(t):
        w = t.split(" ")
        return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)] \
            if len(w) >= k else [t]

    bset = {s for t in bench_texts for s in sh(t)}
    ref = ray.put(bench_shingles(pd.Series(bench_texts), k=k))
    out = Decontaminate(ref, k=k)(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    for i, t in enumerate(texts):
        grams = sh(t)
        exp_overlap = sum(1 for g in grams if g in bset)
        assert out["n_shingles"][i] == len(grams)
        assert out["n_overlap"][i] == exp_overlap, (i, t)
        assert bool(out["contaminated"][i]) == (exp_overlap > 0)
