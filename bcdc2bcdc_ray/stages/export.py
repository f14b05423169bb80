"""Resumable partitioned-parquet export sink.

The generic write path for query/corpus outputs (the lake's merge writer is
the CDC-specific one): partition the stream by a key column, write one
parquet file per partition value via tmp+atomic-rename, and mark each
finished partition with a ``.done`` sidecar — a rerun after a crash skips
every finished partition and rewrites only the missing ones. This is the
"resumable output" contract a 100 TB job needs: the unit of retry is one
partition, never the whole run.

Scale shape: one bucketed exchange on the partition key (the same
``groupby`` → ``map_groups`` pattern as the merge writer — a partition
value lives in exactly one group, so "my file is complete" is a local
fact), then embarrassingly-parallel file writes. Partition values must be
modest in number (one file each — the usual lang/source/date layouts);
size file targets with an upstream ``repartition`` if a single value is
huge.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..state.manifest import atomic_write_parquet


def _safe_name(value) -> str:
    """Partition value → filesystem-safe file stem. The readable part is
    sanitized; a crc32 of the RAW value (None tagged distinctly) is always
    appended so distinct values can never collide onto one file ('en us'
    vs 'en_us', None vs the string 'null')."""
    import zlib

    raw = b"\x00<none>" if value is None else str(value).encode("utf-8")
    s = "null" if value is None else str(value)
    stem = re.sub(r"[^A-Za-z0-9_.=-]", "_", s)[:64] or "_"
    return f"{stem}-{zlib.crc32(raw) & 0xFFFFFFFF:08x}"


def partition_file(out_dir: str, value) -> str:
    return os.path.join(out_dir, f"part-{_safe_name(value)}.parquet")


def write_partitioned(ds, out_dir: str, by: str, resume: bool = True) -> dict:
    """Write ``ds`` as one parquet file per distinct value of ``by``.

    ``resume=True`` (default) skips partitions whose ``.done`` marker
    exists — rerunning after a partial failure rewrites ONLY the missing
    partitions (pinned by test_export_resume_skips_finished). The data
    file lands via tmp+atomic-rename BEFORE the marker, so a marker always
    certifies a complete file. Returns {"written": n, "skipped": n}.
    """
    os.makedirs(out_dir, exist_ok=True)

    def tag(b: pa.Table) -> pa.Table:
        # group on the derived file stem, not the raw key: it is never null
        # (Ray's sort-based groupby rejects null keys) and it puts rows in
        # EXACTLY the group that owns their output file
        col = b.column(by)
        names = {v: _safe_name(v) for v in col.unique().to_pylist()}
        pname = pa.array(
            [names[v] for v in col.to_pylist()], pa.string()
        )
        return b.append_column("__pname", pname)

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"value": pa.array([], pa.string()),
                             "written": pa.array([], pa.int8())})
        g = g.drop_columns(["__pname"])
        # one group may carry several partition values only if Ray merges
        # boundary blocks — split defensively by value
        out_vals, out_flags = [], []
        col = g.column(by)
        for value in col.unique().to_pylist():
            mask = pc.equal(col, value) if value is not None else pc.is_null(col)
            part = g.filter(pc.fill_null(mask, False))
            path = partition_file(out_dir, value)
            done = path + ".done"
            if resume and os.path.exists(done):
                out_vals.append(_safe_name(value))
                out_flags.append(0)
                continue
            atomic_write_parquet(part, path)
            from ..state.fs import fs_for_path

            fs_for_path(done).put_bytes(done, str(part.num_rows).encode())
            out_vals.append(_safe_name(value))
            out_flags.append(1)
        return pa.table(
            {
                "value": pa.array(out_vals, pa.string()),
                "written": pa.array(out_flags, pa.int8()),
            }
        )

    report = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__pname")
        .map_groups(per_group, batch_format="pyarrow")
    )
    written = skipped = 0
    for b in report.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            flags = b.column("written").to_pylist()
            written += sum(flags)
            skipped += len(flags) - sum(flags)
    return {"written": written, "skipped": skipped}


def read_partitioned(out_dir: str) -> pa.Table:
    """Read every COMPLETE partition (marker present) back as one table."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".parquet") and os.path.exists(
            os.path.join(out_dir, name + ".done")
        ):
            parts.append(pq.read_table(os.path.join(out_dir, name)))
    return pa.concat_tables(parts) if parts else None
