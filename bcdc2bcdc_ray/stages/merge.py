"""MergeWriter — the stateful sink stage (actor-pool ``map_groups``).

The Ray-native replacement for the reference's apply phase
(``/root/reference/bcdc2bcdc/CKANUpdate.py:67-83`` ``update`` →
``doAdds/doDeletes/doUpdates``, one serial HTTP POST per record at
``CKANUpdate.py:137-236``): instead of per-record effects, each call merges
ONE lake partition's change group against its parquet file and rewrites it
atomically (SURVEY §2.1 K1 → "merge-write stage").

Execution shape: ``changes.groupby("__part").map_groups(MergeWriter(...))`` —
the groupby is the single all-to-all shuffle in the pipeline and it moves
only the change stream; the lake side never shuffles because its files are
already hash-partitioned by the same key function (co-partitioning, SURVEY
§2.4 J1). The class is instantiated once per worker (actor-pool pattern,
SURVEY §2.3); per call it:

1. drops events at or below the partition's committed watermark
   (exactly-once under WAL-chunk replay);
2. LWW-reduces, classifies and applies the delta (``stages/delta.py``);
3. writes ``part-XXXXX.parquet`` via tmp+atomic-rename, then commits the
   manifest with the new LSN high-watermark and add/update/delete/noop
   counters (``state/manifest.py``);
4. returns a one-row lineage table (the per-partition update report,
   mirroring ``/root/reference/bcdc2bcdc/CKANData.py:1249-1254``).

Scale notes (100 TB): each call touches exactly one partition file sized by
``num_partitions`` (keep partitions ≤ a few hundred MB); calls are
independent → linear scale-out across writer actors; a task retry re-runs a
deterministic merge and the atomic rename + watermark check make the commit
idempotent.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..spec import TableSpec
from ..state.manifest import ManifestStore, PartitionManifest, atomic_write_parquet
from . import delta

PART_COL = "__part"

LINEAGE_SCHEMA = pa.schema(
    [
        ("partition", pa.int64()),
        ("events", pa.int64()),
        ("adds", pa.int64()),
        ("updates", pa.int64()),
        ("deletes", pa.int64()),
        ("noops", pa.int64()),
        ("skipped", pa.int64()),
        ("rows", pa.int64()),
        ("lsn_hi", pa.int64()),
    ]
)


def _in_ray_worker() -> bool:
    """True only inside a Ray worker process (actor/task), never the driver."""
    try:
        import ray
        from ray._private import worker as _rw

        return ray.is_initialized() and _rw.global_worker.mode == _rw.WORKER_MODE
    except Exception:
        return False


def partition_path(lake_dir: str, pid: int) -> str:
    return os.path.join(lake_dir, f"part-{pid:05d}.parquet")


def read_partition(lake_dir: str, pid: int, schema: pa.Schema) -> pa.Table:
    p = partition_path(lake_dir, pid)
    if os.path.exists(p):
        return pq.read_table(p)
    return schema.empty_table()


class MergeWriter:
    """Callable class for ``groupby(PART_COL).map_groups`` — one lake
    partition merge per call. State (spec, manifest store) built once per
    actor in ``__init__``."""

    def __init__(
        self,
        lake_dir: str,
        spec: TableSpec,
        dry_run: bool = False,
        changes_dir: str | None = None,
        changes_before: bool = False,
    ):
        # Each writer actor reserves 1 CPU; Arrow's default thread pool is
        # sized to the MACHINE, so N concurrent actors × machine-width acero
        # joins oversubscribe the node ~N× (measured 3-20× per-call inflation
        # at 16 actors / 32 cores). Pin this actor's Arrow pools to its own
        # CPU budget — but ONLY inside a Ray worker process: the calls are
        # process-global, and a MergeWriter built on the driver (tests,
        # direct use) must not throttle Arrow for everything that follows.
        if _in_ray_worker():
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
        self.lake_dir = lake_dir
        self.spec = spec
        self.dry_run = dry_run  # classify + count, write nothing
        self.changes_dir = changes_dir  # outbound CDC feed (None = off)
        self.changes_before = changes_before  # emit before_* pre-images
        self.store = ManifestStore(lake_dir)  # resolves the lake-fs backend
        if changes_dir and not dry_run:
            os.makedirs(changes_dir, exist_ok=True)
            # the feed inherits the lake's storage backend: plant the
            # marker so feed writes/pruning commit under the same protocol
            from ..state import fs as lakefs

            lakefs.mark_fs(changes_dir, self.store.fs.kind)

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # Ray may emit empty boundary blocks
            return LINEAGE_SCHEMA.empty_table()
        pid = int(group.column(PART_COL)[0].as_py())
        events = group.drop_columns([PART_COL])

        manifest = self.store.load(pid)
        wm = manifest.lsn_hi if manifest else -1
        n_in = events.num_rows
        if wm >= 0:
            events = events.filter(pc.greater(events.column("lsn"), wm))
        skipped = n_in - events.num_rows
        if events.num_rows == 0:
            # all-skip path runs only when the manifest commit landed, so
            # its rows count is authoritative — no footer read needed
            cur_rows = manifest.rows if manifest else 0
            return pa.table(
                {
                    "partition": [pid], "events": [n_in], "adds": [0], "updates": [0],
                    "deletes": [0], "noops": [0], "skipped": [skipped],
                    "rows": [cur_rows], "lsn_hi": [wm],
                },
                schema=LINEAGE_SCHEMA,
            )

        current = read_partition(self.lake_dir, pid, self.spec.schema)
        if self.changes_dir is not None:
            new_state, counts, feed = delta.merge_partition(
                current, events, self.spec, persist_hash=True, changes=True,
                changes_before=self.changes_before,
            )
        else:
            new_state, counts = delta.merge_partition(
                current, events, self.spec, persist_hash=True
            )
            feed = None
        lsn_hi = int(pc.max(events.column("lsn")).as_py())

        if not self.dry_run:
            if feed is not None and feed.num_rows:
                # outbound change feed, written BEFORE the data/manifest
                # commit under a deterministic (pid, lsn_hi) name: a task
                # retry rewrites the same file atomically, and a replay of
                # already-committed chunks never reaches here (watermark
                # filter above). Invariant: the feed LEADS the lake inside
                # the crash window — if this replay is abandoned (never
                # retried), consumers may fold changes the lake hasn't
                # committed until the SAME chunk is replayed; exactly-once
                # holds once every started replay eventually completes.
                # (lsn_hi > wm always here: events were filtered to
                # lsn > wm and the empty case returned above.)
                atomic_write_parquet(
                    feed,
                    os.path.join(
                        self.changes_dir,
                        f"changes-{pid:05d}-{lsn_hi:012d}.parquet",
                    ),
                    fs=self.store.fs,
                )
            atomic_write_parquet(
                new_state, partition_path(self.lake_dir, pid), fs=self.store.fs
            )
            _maybe_crash_once(self.lake_dir, pid)
            from ..canonical import partition_fingerprint

            self.store.commit(
                PartitionManifest(
                    partition=pid,
                    lsn_hi=lsn_hi,
                    rows=new_state.num_rows,
                    counts=counts,
                    schema_names=list(new_state.schema.names),
                    data_file=f"part-{pid:05d}.parquet",
                    content_fp=partition_fingerprint(
                        new_state, list(self.spec.key)
                    ),
                )
            )
        return pa.table(
            {
                "partition": [pid],
                "events": [n_in],
                "adds": [counts["adds"]],
                "updates": [counts["updates"]],
                "deletes": [counts["deletes"]],
                "noops": [counts["noops"]],
                "skipped": [skipped],
                "rows": [new_state.num_rows],
                "lsn_hi": [lsn_hi],
            },
            schema=LINEAGE_SCHEMA,
        )


def bound_writer(
    lake_dir: str,
    spec: TableSpec,
    dry_run: bool = False,
    changes_dir: str | None = None,
    changes_before: bool = False,
) -> type:
    """MergeWriter subclass with the constructor parameters baked into the
    serialized class itself (cloudpickle ships the closure with the class):
    the writer actor is created with ZERO constructor arguments, so no
    argument ever lands in the object store and an actor RESTART can never
    fail because a driver-held argument ref went out of scope (Ray's
    ``core_worker.cc`` warning for ``max_restarts > 0`` actors, ray#53727)
    — the restart path is exactly the crash-recovery window the
    exactly-once claim leans on.

    Note: Ray 2.49 still logs the core_worker.cc:2246 warning once per
    actor-pool stage. That instance is upstream, not ours: Ray Data's
    ``ActorPoolMapOperator._start_actor`` passes its OWN serialized
    ``map_transformer`` to every ``MapWorker`` by object-store ref, so the
    warning fires even for ``range(10).map_batches(TrivialCls,
    concurrency=1)`` with zero user constructor args. It is benign for
    Dataset pipelines (the operator pins ``self._map_transformer`` for the
    whole execution, so the ref cannot go out of scope while restarts can
    still happen); the only way to silence it is ``max_restarts=0``, which
    would disable the in-run actor recovery the crash test
    (test_exactly_once_survives_writer_crash) exercises."""

    class _BoundMergeWriter(MergeWriter):
        def __init__(self):
            super().__init__(lake_dir, spec, dry_run, changes_dir, changes_before)

    return _BoundMergeWriter


def _maybe_crash_once(lake_dir: str, pid: int) -> None:
    """Crash-consistency test hook — a no-op unless the test suite plants a
    ``_fault_once`` file (containing a partition id) in the lake dir. Then
    the FIRST time that partition reaches the point between the data-file
    rename and the manifest commit — the nastiest crash window, where the
    merged file is durable but the watermark is not — the worker process
    hard-exits. The exactly-once claim requires the retry to converge:
    re-merging already-applied events classifies them NOOP by content hash,
    so the final state is byte-identical (pinned by
    test_exactly_once_survives_writer_crash)."""
    flag = os.path.join(lake_dir, "_fault_once")
    if not os.path.exists(flag):
        return
    try:
        with open(flag) as f:
            target = int(f.read().strip())
    except (OSError, ValueError):
        return
    if pid != target:
        return
    marker = os.path.join(lake_dir, f"_crashed-{pid}")
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        return  # already crashed once — proceed normally on the retry
    os._exit(1)
