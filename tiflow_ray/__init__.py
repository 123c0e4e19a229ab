"""tiflow_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the change-data semantics of TiCDC/DM
(reference: wk989898/tiflow) on ray.data: a WAL/binlog-tail source emits
insert/update/delete events over a Parquet lake of pre-tokenized training
sequences, and a key-partitioned merge-apply stage replays them into the
target table — map_batches over zero-copy Arrow, explicit hash partitioning
on doc_id, commit-ts-ordered last-writer-wins reduction (DM compactor
semantics, dm/syncer/compactor.go:152-225), schema-evolution barriers
(cdc/owner/ddl_manager.go:395-425), and an idempotent two-phase Parquet sink
with checkpoint/lineage (pkg/sink/cloudstorage/dml_worker.go:209-231).
"""

import os as _os

# one Rust thread per polars call-site: polars is used for per-batch key
# hashing inside Ray workers — its default whole-machine thread pool would
# oversubscribe every core 32x (set before any polars import, inherited by
# workers spawned after driver import)
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.2.0"
