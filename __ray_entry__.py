"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in tiflow_ray) calls ray.init()/ray.shutdown().

- entry(): flagship CDC replay on /root/testdata/sf0.001 — derives a change
  stream from the events table, stages a WAL + hash-partitioned base lake,
  and replays it through the full engine (normalize → update-split → LWW
  compact → co-partitioned merge → two-phase sink).
- queries(): one entry per implemented operator family (SURVEY.md §2 +
  training-data ops); each takes sf_dir and returns a Table/DataFrame.
- oracle_sql(): DuckDB twins for every SQL-expressible query (column names
  and types match exactly; MinHash/SimHash are rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    from tiflow_ray.queries import q_cdc_replay
    return q_cdc_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from tiflow_ray.queries import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    from tiflow_ray.queries import oracle_sql as _o
    return _o()
