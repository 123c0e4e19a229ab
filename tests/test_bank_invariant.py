"""Bank-style randomized invariant workload (the analog of the reference's
tests/integration_tests/bank: random transfers + a conserved global-sum
invariant checked after replay, across stop/resume and GC).

Accounts are docs; a transfer emits TWO same-commit-ts update events (the
two legs of one upstream txn) carrying each account's absolute post-
transfer balance in tokens[0]. If the engine ever applied a key's events
out of (commit_ts, start_ts) order, a stale image would survive and the
global sum would (with overwhelming probability) break."""

import os

import numpy as np
import pyarrow as pa
import pytest

from tiflow_ray import fixtures
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.state.checkpoint import LakeState

N_ACCOUNTS = 40
N_TRANSFERS = 1500
INIT = 1000


def _bank_fixture(root: str, seed: int) -> np.ndarray:
    """Write base + WAL; returns the oracle final balances."""
    rng = np.random.default_rng(seed)
    acct_idx = np.arange(N_ACCOUNTS, dtype=np.int64)
    names = fixtures.doc_name(acct_idx)
    balances = np.full(N_ACCOUNTS, INIT, dtype=np.int64)

    base = pa.table({
        "doc_id": pa.array(names),
        "tokens": pa.array([[INIT]] * N_ACCOUNTS, pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(N_ACCOUNTS, np.int32)),
        "source": pa.array(["bank"] * N_ACCOUNTS),
    })
    fixtures.write_base_partitioned(base, root, 8)

    rows_doc, rows_ts, rows_st, rows_bal = [], [], [], []
    for t in range(N_TRANSFERS):
        a, b = rng.choice(N_ACCOUNTS, size=2, replace=False)
        amt = int(rng.integers(1, 100))
        balances[a] -= amt          # overdrafts allowed; sum still conserved
        balances[b] += amt
        cts = 1_000 + t
        for leg, acct in enumerate((a, b)):
            rows_doc.append(acct)
            rows_ts.append(cts)     # both legs share the txn commit ts
            rows_st.append(2 * t + leg)
            rows_bal.append(int(balances[acct]))
    n = len(rows_doc)
    wal = pa.table({
        "op": pa.array(np.full(n, 2, np.uint8)),
        "commit_ts": pa.array(np.array(rows_ts, np.uint64)),
        "start_ts": pa.array(np.array(rows_st, np.uint64)),
        "doc_id": pa.array(names[np.array(rows_doc)]),
        "tokens": pa.array([[b] for b in rows_bal], pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(["bank"] * n),
        "pre_tokens": pa.nulls(n, pa.list_(pa.int32())),
        "new_doc_id": pa.nulls(n, pa.string()),
        "schema_ver": pa.array(np.ones(n, np.int32)),
    })
    fixtures.write_wal_segments(wal, os.path.join(root, "wal"), 6)
    return balances


@pytest.mark.parametrize("seed", [0, 7, 23])
def test_bank_total_balance_conserved(tmp_path, seed):
    root = str(tmp_path / f"bank{seed}")
    os.makedirs(root)
    exp_balances = _bank_fixture(root, seed)
    assert exp_balances.sum() == N_ACCOUNTS * INIT   # generator sanity

    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=os.path.join(root, "lake"),
                       num_partitions=8, max_segments_per_epoch=2)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    # stop mid-stream, GC, resume — the invariant must hold across the
    # checkpoint machinery, not just a clean one-shot replay
    from tiflow_ray.sources.wal import list_segments
    segs = list_segments(cfg.wal_dir)
    rp.run_replay(cfg, upto_ts=segs[len(segs) // 2].watermark_ts)
    LakeState(cfg.lake_dir).gc(keep_epochs=1)
    rp.run_replay(cfg)

    final = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert final.num_rows == N_ACCOUNTS
    got = {d: t[0] for d, t in zip(final["doc_id"].to_pylist(),
                                   final["tokens"].to_pylist())}
    total = sum(got.values())
    assert total == N_ACCOUNTS * INIT, f"sum broke: {total}"
    names = fixtures.doc_name(np.arange(N_ACCOUNTS))
    for i, name in enumerate(names):
        assert got[name] == exp_balances[i], name
