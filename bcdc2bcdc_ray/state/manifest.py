"""Per-partition commit manifests + LSN high-watermarks.

The exactly-once / resume backbone (SURVEY §7 steps 5 & 7). Replaces the
reference's verify-then-refetch and per-request retry loops
(``/root/reference/bcdc2bcdc/CKAN.py:1232-1266,825-831``) and its JSON
read-through cache as cross-run state (``/root/reference/bcdc2bcdc/CacheFiles.py:151-229``)
with an idempotent commit protocol:

- one JSON manifest per logical lake partition: ``{partition, lsn_hi,
  counts{adds,updates,deletes,noops}, rows, schema_names, data_file,
  content_fp}``;
- data written to ``part-XXXXX.parquet.tmp-<nonce>`` then atomically
  ``os.replace``d — a Ray task retry that dies mid-write leaves only a tmp
  file, never a torn partition (SURVEY §7 hard part (a));
- the manifest is written (atomically) only AFTER the data rename, so
  ``manifest.lsn_hi`` is the partition's high-watermark under the
  PROCESS-crash model (task retry / driver kill — what Ray gives and the
  crash-injection tests exercise). Power-loss/kernel-crash durability
  additionally needs fsync of file + directory around each rename —
  enabled with ``BCDC_FSYNC=1`` (off by default: local benchmarking; on
  a production cluster writing to shared storage, turn it on);
- re-applying a batch whose ``lsn_hi <= watermark`` is a no-op (skip), which
  makes replay of committed WAL chunks idempotent;
- manifests key on the LOGICAL partition id, not any salted shuffle group
  (SURVEY §7 hard part (c)).

Counters per partition mirror the reference's update report / delta counters
(``/root/reference/bcdc2bcdc/CKANData.py:1249-1254``).

A filesystem-backed store is the right shape for a multi-node cluster too:
on shared storage (S3/NFS) every writer actor sees the same manifest
directory; writes stay per-partition so there is no cross-writer contention.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, fields

from .fs import LakeFS, fs_for, fs_for_path


def atomic_write_json(path: str, obj, fs: LakeFS | None = None) -> None:
    """The engine-wide atomic JSON commit, routed through the target
    directory's lake-fs backend (state/fs.py): posix = tmp + os.replace
    (+ file/dir fsync under ``BCDC_FSYNC=1``), object = atomic PUT. One
    helper so a durability change lands everywhere at once."""
    (fs or fs_for_path(path)).put_json(path, obj)


@dataclass
class PartitionManifest:
    partition: int
    lsn_hi: int
    rows: int
    counts: dict = field(default_factory=lambda: {"adds": 0, "updates": 0, "deletes": 0, "noops": 0})
    schema_names: list = field(default_factory=list)
    data_file: str = ""
    # order-independent uint64 fingerprint of the partition's key→content
    # state (canonical.partition_fingerprint), committed with every write.
    # None on manifests predating the field — consumers (diff_lakes skip,
    # fsck audit) must treat None as "unknown", never as a mismatch.
    content_fp: int | None = None


class ManifestStore:
    def __init__(self, lake_dir: str):
        self.dir = os.path.join(lake_dir, "_manifests")
        os.makedirs(self.dir, exist_ok=True)
        # backend resolved once per store (== once per writer actor)
        self.fs = fs_for(lake_dir)

    def _path(self, pid: int) -> str:
        return os.path.join(self.dir, f"part-{pid:05d}.json")

    def load(self, pid: int) -> PartitionManifest | None:
        p = self._path(pid)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            raw = json.load(f)
        # forward-compatible: a manifest written by a NEWER engine with
        # extra fields must still load here (the mirror of content_fp's
        # treat-missing-as-unknown backward compat)
        known = {f.name for f in fields(PartitionManifest)}
        return PartitionManifest(**{k: v for k, v in raw.items() if k in known})

    def watermark(self, pid: int) -> int:
        m = self.load(pid)
        return m.lsn_hi if m else -1

    def watermarks(self) -> dict[int, int]:
        out: dict[int, int] = {}
        for fn in os.listdir(self.dir):
            if fn.startswith("part-") and fn.endswith(".json"):
                pid = int(fn[5:-5])
                out[pid] = self.watermark(pid)
        return out

    def commit(self, m: PartitionManifest) -> None:
        """Atomic publish (backend-routed). Safe under task retry — last
        writer wins and both writers wrote identical content for identical
        (partition, lsn_hi) inputs (deterministic merge)."""
        atomic_write_json(self._path(m.partition), asdict(m), fs=self.fs)

    # ---- lake-level replay watermark -------------------------------------
    # Committed by replay() ONLY after every partition's manifest commit
    # returned, so "global_watermark = W" means every event with lsn <= W is
    # durably applied (or was a no-op) on every partition. Lets chunk-level
    # pruning skip the TAIL chunk too, whose max LSN always exceeds the
    # minimum per-partition watermark (events route by key hash, so the last
    # lsn routed to each partition differs).

    def _gpath(self) -> str:
        return os.path.join(self.dir, "_replay_watermark.json")

    def global_watermark(self) -> int:
        p = self._gpath()
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            return int(json.load(f)["lsn_hi"])

    def commit_global(self, lsn_hi: int) -> None:
        cur = self.global_watermark()
        if lsn_hi <= cur:
            return
        atomic_write_json(self._gpath(), {"lsn_hi": int(lsn_hi)}, fs=self.fs)

    def total_counts(self) -> dict:
        tot = {"adds": 0, "updates": 0, "deletes": 0, "noops": 0, "rows": 0}
        for fn in os.listdir(self.dir):
            if fn.startswith("part-") and fn.endswith(".json"):
                m = self.load(int(fn[5:-5]))
                if m:
                    for k in ("adds", "updates", "deletes", "noops"):
                        tot[k] += m.counts.get(k, 0)
                    tot["rows"] += m.rows
        return tot


def atomic_write_parquet(table, final_path: str, fs: LakeFS | None = None) -> None:
    """Write a pa.Table to final_path as one atomic publish, routed through
    the target directory's lake-fs backend: posix = tmp + os.replace
    (torn-write safe under process crash; file+dir fsync under
    ``BCDC_FSYNC=1``), object = atomic whole-object PUT."""
    (fs or fs_for_path(final_path)).put_parquet(final_path, table)
