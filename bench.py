"""Benchmark harness: headline CDC replay throughput + representative
operator timings. Prints ONE JSON line.

  python bench.py                  # $GRAFT_SF_DIR (default /root/testdata/sf0.1),
                                   # $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling        # same job at 8 and 32 CPUs in fresh
                                   # processes → throughputs + efficiency
                                   # (the sandbox proxy for N vs 4N nodes,
                                   # BASELINE.md), also appended to BASELINE.md

Headline: replay a deterministic synthetic change stream (sized by sf:
40M events/sf → 4M at sf0.1) through the full engine into a P=64 lake.
The fixture is generated once and cached under /tmp so scaling runs and
repeated rounds measure replay, not generation.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = "/tmp/tiflow_ray_bench"


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(os.path.normpath(d))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_fixture(sf: float) -> tuple[str, int, int]:
    """Generate (once) the bench CDC fixture sized by sf. Returns
    (root, n_events, P)."""
    n_events = max(100_000, int(200_000_000 * sf))  # 2e7 at sf0.1 (FIXTURES.md bench tier)
    n_docs = max(10_000, n_events // 10)
    P = 64
    root = os.path.join(CACHE, f"fx_e{n_events}_d{n_docs}_p{P}")
    marker = os.path.join(root, "fixture.json")
    if not os.path.exists(marker):
        from tiflow_ray import fixtures
        shutil.rmtree(root, ignore_errors=True)
        fixtures.generate_tier(root, "bench", n_docs=n_docs, n_events=n_events,
                               n_segments=16, num_partitions=P, max_len=64,
                               include_pre=False)
    return root, n_events, P


def bench_replay(root: str, P: int) -> dict:
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.sources.wal import list_segments

    lake = os.path.join(root, f"lake_cpu{CPUS}")
    shutil.rmtree(lake, ignore_errors=True)
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"), lake_dir=lake,
                       num_partitions=P, max_segments_per_epoch=8,
                       batch_size=131_072)
    segments = list_segments(cfg.wal_dir)
    raw_events = sum(s.rows for s in segments)

    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    t0 = time.perf_counter()
    res = rp.run_replay(cfg)
    dt = time.perf_counter() - t0
    return {"sec": dt, "events": raw_events, "epochs": len(res.epochs),
            "events_per_sec": raw_events / dt}


def bench_queries(sf_dir: str) -> dict:
    """Representative operator timings (secondary metrics)."""
    from tiflow_ray import queries as Q
    out = {}
    for name in ["text_stats", "doc_fingerprint", "dedup_minhash",
                 "knn_search", "agg_partial", "lww_compact"]:
        fn = Q.REGISTRY[name][0]
        t0 = time.perf_counter()
        fn(sf_dir)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_once() -> dict:
    import logging

    import ray
    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sf = _sf_from_dir(SF_DIR)
    root, n_events, P = ensure_fixture(sf)
    # warm the page cache so we measure compute+shuffle, not first disk read
    import glob

    import pyarrow.parquet as pq
    for f in glob.glob(os.path.join(root, "wal", "*.parquet")):
        pq.read_metadata(f)

    replay = bench_replay(root, P)
    qtimes = bench_queries(SF_DIR)
    ray.shutdown()

    return {
        "metric": "cdc_replay_wall_seconds",
        "value": round(replay["sec"], 3),
        "unit": "sec",
        "queries": {"cdc_replay_bench": round(replay["sec"], 3), **qtimes},
        "sf": sf,
        "num_cpus": CPUS,
        "events": replay["events"],
        "events_per_sec": round(replay["events_per_sec"], 1),
        "epochs": replay["epochs"],
    }


def run_scaling() -> dict:
    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = sub(8), sub(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    result = {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "sec_8": lo["value"], "sec_32": hi["value"],
        "events_per_sec_8": lo["events_per_sec"],
        "events_per_sec_32": hi["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "events": lo["events"], "sf": lo["sf"],
    }
    _record_baseline(result)
    return result


def _record_baseline(r: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    try:
        with open(path) as f:
            text = f.read()
        marker = "\n## Measured scaling (bench.py --scaling)\n"
        section = (f"{marker}\n"
                   f"| events | sec @8cpu | sec @32cpu | ev/s @8 | ev/s @32 | efficiency (target ≥0.8) |\n"
                   f"|---|---|---|---|---|---|\n"
                   f"| {r['events']} | {r['sec_8']} | {r['sec_32']} | "
                   f"{r['events_per_sec_8']} | {r['events_per_sec_32']} | "
                   f"**{r['scaling_efficiency']}** |\n")
        if marker in text:
            text = text[:text.index(marker)] + section
        else:
            text += section
        with open(path, "w") as f:
            f.write(text)
    except OSError:
        pass


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
