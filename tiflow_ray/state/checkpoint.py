"""Lake manifest + checkpoint: the exactly-once / resume machinery.

Design (SURVEY.md §2.2/§2.9), mirroring the reference's recovery story:

- data files have DETERMINISTIC names `data/part={p}/epoch-{n:06d}.parquet`
  and are written tmp-then-rename, so a retried/replayed task overwrites an
  identical file instead of duplicating — the two-phase "index file before
  data file" trick of the storage sink
  (pkg/sink/cloudstorage .../dml_worker.go:209-231).
- the driver commits an epoch by atomically renaming
  `_manifest/epoch-{n}.json.tmp` → `.json`; the manifest maps every
  partition to its CURRENT data file + schema version (O(P), not O(rows)) —
  the `meta/CDC.index` + schema-file analog (pkg/sink/cloudstorage/path.go).
- the checkpoint is just "the largest committed epoch" plus its watermark;
  resume = re-plan epochs from that watermark and continue — identical code
  path to normal operation, like `cdc redo apply` (pkg/applier/redo.go:162-230)
  and the storage consumer's file-index diff (cmd/storage-consumer/main.go:229-248).
- per-partition applied watermarks + row/byte counters ride in each manifest
  (the redo-meta / lineage record, cdc/redo/meta_manager.go:42-116).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field


@dataclass
class Manifest:
    epoch: int
    watermark_ts: int
    schema_ver: int                       # current table schema version
    num_partitions: int = 0               # P the lake is laid out with
    registry_json: str = "[]"             # DDL schedule → the lake is
                                          # self-describing (schema_{ver}.json analog)
    parts: dict[str, dict] = field(default_factory=dict)
    # parts[str(p)] = {"path": ..., "schema_ver": v, "rows": n,
    #                  "watermark_ts": w, "bytes": b}
    segments_applied: list[str] = field(default_factory=list)
    stats: dict = field(default_factory=dict)
    hash_fingerprint: str = ""            # key_hash64 canary (model.hash_fingerprint):
                                          # resume fails loudly if the hash fn changed

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        return cls(**json.loads(s))


def _atomic_write(path: str, data: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class LakeState:
    """Driver-side view of `lake_dir/_manifest`. Commit is the ONLY side
    effect trusted for progress; task-written data files are inert until a
    manifest references them (SURVEY.md §7 known-hard #3)."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.manifest_dir = os.path.join(lake_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(os.path.join(lake_dir, "data"), exist_ok=True)

    # -- read side ---------------------------------------------------------

    def committed_epochs(self) -> list[int]:
        out = []
        for p in glob.glob(os.path.join(self.manifest_dir, "epoch-*.json")):
            name = os.path.basename(p)
            out.append(int(name[len("epoch-"):-len(".json")]))
        return sorted(out)

    def latest(self) -> Manifest | None:
        es = self.committed_epochs()
        if not es:
            return None
        return self.load(es[-1])

    def load(self, epoch: int) -> Manifest:
        with open(self._mpath(epoch)) as f:
            return Manifest.from_json(f.read())

    # -- write side --------------------------------------------------------

    def commit(self, m: Manifest) -> None:
        _atomic_write(self._mpath(m.epoch), m.to_json())

    def gc(self, keep_epochs: int = 2) -> dict:
        """Garbage-collect the lake: keep the newest `keep_epochs` manifests
        and delete every data file under lake_dir/data not referenced by any
        of them (the analog of sorter CleanByTable + schema-version DoGC,
        cdc/processor/processor.go / cdc/entry/schema_storage.go:191-345).
        Never touches files OUTSIDE the lake (e.g. bootstrap base files).
        Returns {"manifests_removed": n, "files_removed": n}."""
        epochs = self.committed_epochs()
        keep = set(epochs[-max(1, keep_epochs):])
        referenced: set[str] = set()
        for e in keep:
            m = self.load(e)
            for meta in m.parts.values():
                if meta.get("path"):
                    referenced.add(os.path.realpath(meta["path"]))
                for d in meta.get("deltas", []):
                    referenced.add(os.path.realpath(d["path"]))
        files_removed = self._sweep_unreferenced(referenced)
        manifests_removed = 0
        for e in epochs:
            if e not in keep:
                os.remove(self._mpath(e))
                manifests_removed += 1
        return {"manifests_removed": manifests_removed,
                "files_removed": files_removed}

    def rewind(self, epoch: int, wal_dir: str | None = None) -> dict:
        """Point-in-time rewind: make committed `epoch` the lake head
        again (changefeed rollback — the inverse of resume; the PITR move
        `cdc redo apply` enables downstream). Replay after rewind re-reads
        WAL segments past the target watermark through the NORMAL epoch
        path, so rewind+replay ≡ resume from an older checkpoint.

        Safety rails:
        - the target manifest must exist (not GC'd) and every data file it
          references must still exist — else the rewind would land on an
          unreadable head;
        - when `wal_dir` is given, every WAL segment the REMOVED manifests
          had applied must still exist there: those are exactly the files
          replay needs to rebuild (target, old-head], and `gc_wal` may
          have dropped them — fail loudly instead of silently losing the
          span;
        - manifests are removed NEWEST-FIRST, so `latest()` points at a
          fully-committed manifest at every intermediate step (a crash
          mid-rewind leaves a consistent, merely less-rewound lake);
        - data files referenced only by removed manifests are swept last
          (pure GC — losing the sweep to a crash is harmless)."""
        epochs = self.committed_epochs()
        if epoch not in epochs:
            raise ValueError(
                f"rewind target epoch {epoch} is not committed "
                f"(have {epochs}) — GC'd or never reached")
        target = self.load(epoch)
        missing = []
        for meta in target.parts.values():
            for p in [meta.get("path")] + \
                    [d["path"] for d in meta.get("deltas", [])]:
                if p and not os.path.exists(p):
                    missing.append(p)
        if missing:
            raise ValueError(
                f"rewind target epoch {epoch} references GC'd data files "
                f"(e.g. {missing[0]}); pick a retained epoch")

        removed_epochs = [e for e in epochs if e > epoch]
        if wal_dir is not None:
            # segments_applied is CUMULATIVE per manifest; only the span
            # ABOVE the target needs to be re-playable
            need = set()
            for e in removed_epochs:
                need.update(self.load(e).segments_applied)
            need -= set(target.segments_applied)
            gone = sorted(s for s in need if not os.path.exists(
                os.path.join(wal_dir, s)) and not os.path.exists(s))
            if gone:
                raise ValueError(
                    f"rewind to epoch {epoch} needs WAL segments already "
                    f"GC'd (e.g. {gone[0]}) — the span above the target "
                    "cannot be replayed; rewind refused")

        for e in sorted(removed_epochs, reverse=True):
            os.remove(self._mpath(e))
        referenced: set[str] = set()
        for e in self.committed_epochs():
            m = self.load(e)
            for meta in m.parts.values():
                if meta.get("path"):
                    referenced.add(os.path.realpath(meta["path"]))
                for d in meta.get("deltas", []):
                    referenced.add(os.path.realpath(d["path"]))
        files_removed = self._sweep_unreferenced(referenced)
        return {"manifests_removed": len(removed_epochs),
                "files_removed": files_removed,
                "watermark_ts": target.watermark_ts}

    def _sweep_unreferenced(self, referenced: set[str]) -> int:
        """Delete every data file under the lake not in `referenced` —
        covers BOTH layouts: single-table data/part=p and multi-table
        data/table=T/part=p (a dropped table's chains leave the manifest
        at its drop barrier; once no retained manifest references them,
        this sweep reclaims the bytes — the storage half of DROP TABLE).
        Empty table=T dirs left file-less are pruned too."""
        data_root = os.path.realpath(os.path.join(self.lake_dir, "data"))
        files_removed = 0
        for pat in (os.path.join(data_root, "part=*", "*.parquet"),
                    os.path.join(data_root, "table=*", "part=*",
                                 "*.parquet")):
            for p in glob.glob(pat):
                if os.path.realpath(p) not in referenced:
                    os.remove(p)
                    files_removed += 1
        for tdir in glob.glob(os.path.join(data_root, "table=*")):
            for pd in glob.glob(os.path.join(tdir, "part=*")):
                if not os.listdir(pd):
                    os.rmdir(pd)
            if not os.listdir(tdir):
                os.rmdir(tdir)
        return files_removed

    def data_path(self, part: int, epoch: int) -> str:
        d = os.path.join(self.lake_dir, "data", f"part={part}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"epoch-{epoch:06d}.parquet")

    def _mpath(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch-{epoch:06d}.json")
