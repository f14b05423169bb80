"""WAL-tail source: chunk discovery, footer-stats pruning, audit sink.

The lake-native replacement for the reference's paged readers and JSON
read-through cache (``/root/reference/bcdc2bcdc/CKAN.py:208-257,1085-1266``
paging/thread-pool fan-out — SURVEY §2.1 S1/S2/S8): the "source" is a
directory of LSN-ordered parquet chunks; discovery is a listing, paging is
block splitting, and the verify/refetch loop becomes footer-stats pruning
against committed watermarks.

Scale note: ``prune_committed_chunks`` reads ONLY parquet footers (row-group
min/max statistics on ``lsn``), so a resumed 10^10-event replay skips every
fully-committed chunk without touching its data — the chunk-level analog of
the per-partition watermark check inside the merge writer.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Sequence

import pyarrow.parquet as pq


@dataclass(frozen=True)
class ChunkStats:
    path: str
    rows: int
    lsn_lo: int
    lsn_hi: int


def list_wal_chunks(wal_dir: str) -> list[str]:
    """Deterministic (sorted) listing of the WAL directory — the S1
    package-list analog; ordering matters because chunk file order is the
    coarse LSN order."""
    return sorted(
        os.path.join(wal_dir, f)
        for f in os.listdir(wal_dir)
        if f.endswith(".parquet")
    )


def chunk_stats(path: str, lsn_col: str = "lsn") -> ChunkStats:
    """LSN range + row count from the parquet FOOTER only (no data read)."""
    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().get_field_index(lsn_col)
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            # no stats → unprunable; treat as spanning everything
            return ChunkStats(path, md.num_rows, -(2**62), 2**62)
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:  # zero row groups
        return ChunkStats(path, 0, 0, -1)
    return ChunkStats(path, md.num_rows, int(lo), int(hi))


def prune_committed_chunks(
    paths: Sequence[str],
    watermarks: dict[int, int],
    num_partitions: int,
    lsn_col: str = "lsn",
    global_watermark: int = -1,
) -> tuple[list[str], int]:
    """Drop whole chunks already committed everywhere.

    A chunk is skippable iff its max LSN ≤ the effective watermark:
    max(lake-level replay watermark, minimum per-partition watermark). The
    per-partition minimum alone can never clear the tail chunk (the last LSN
    routed to each partition differs), which is what the lake-level
    watermark — committed only after a replay fully succeeds — covers. A
    partition without a manifest has watermark -1, disabling the partition
    term until every partition has committed (events route by key hash, so
    any chunk may touch any partition). Returns (surviving paths, pruned row
    count). Conservative by construction: the per-event filter in
    AssignPartition and the authoritative check in the merge writer still
    run on survivors.
    """
    min_wm = -1
    if watermarks and len(watermarks) >= num_partitions:
        min_wm = min(watermarks.get(pid, -1) for pid in range(num_partitions))
    min_wm = max(min_wm, global_watermark)
    if min_wm < 0:
        return list(paths), 0
    keep, pruned_rows = [], 0
    for p in paths:
        st = chunk_stats(p, lsn_col)
        if st.lsn_hi <= min_wm:
            pruned_rows += st.rows
        else:
            keep.append(p)
    return keep, pruned_rows


def write_audit_json(report: dict, out_dir: str, name: str = "run_report") -> str:
    """K2 debug-dump analog (``/root/reference/bcdc2bcdc/CKANData.py:624-693``
    per-record JSON dumps): persist the replay report + per-partition lineage
    as one JSON audit file (atomic write)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1, default=str)
    os.replace(tmp, path)
    return path
