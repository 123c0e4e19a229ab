"""Pipeline configuration (the analog of the reference's changefeed +
sink config surface, pkg/config/ + pkg/sink/cloudstorage/config.go)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ReplayConfig:
    # layout
    wal_dir: str = ""                 # directory of seq=*.parquet + metas
    lake_dir: str = ""                # output lake root (manifest/checkpoint/data)
    num_partitions: int = 16          # P: fixed hash partitions on doc_id

    # epoching
    max_segments_per_epoch: int = 8   # coalesce WAL segments per epoch (never across a barrier)

    # execution sizing (see SURVEY.md §4; these mirror the reference's pools:
    # mounter 16, encoding 8, storage dmlWorkers 16)
    batch_size: int = 65536           # rows per map_batches call
    merge_concurrency: int | None = None   # actor/task parallelism for merge stage (None = Ray default)

    # behavior toggles
    precompact: bool = True           # per-batch LWW combiner before shuffle (DM compactor, T6)
    validate: bool = False            # extra per-batch invariant checks (tests)
    safe_mode: bool = True            # upsert-on-missing / delete-missing-ok (DM safe mode §2.9)

    # event filtering (M5/M7 analog): drop events whose `source` is in this set
    ignore_sources: frozenset[str] = field(default_factory=frozenset)
