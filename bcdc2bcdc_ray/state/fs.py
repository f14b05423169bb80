"""Pluggable lake filesystem backends — the commit protocol abstracted.

The engine's exactly-once story (tmp + ``os.replace`` data commits,
``os.link`` lock acquisition, hardlink snapshots — state/manifest.py,
pipelines/cdc.py) was POSIX-only. A fixed-size multi-node cluster
streaming ~100 TB stores its lake on an object store (S3/GCS) or NFS,
none of which offer those primitives with those semantics. This module
narrows every durability-bearing write to a small interface with two
implementations:

- :class:`PosixFS` (default, kind ``"posix"``): the existing protocol,
  byte-for-byte — tmp file + ``os.replace`` publishes, ``os.link``
  atomic create-with-content, hardlink zero-copy clones, ``st_nlink``
  exclusive-bytes accounting.

- :class:`ObjectFS` (kind ``"object"``): the same interface using ONLY
  operations every real object store offers — atomic whole-object PUT
  (S3 multipart-complete / GCS compose commit the object atomically; a
  reader can never observe a torn object), conditional PUT
  (``If-None-Match``), server-side COPY (CopyObject), GET, LIST,
  DELETE. No rename-of-existing as an atomicity primitive, no
  hardlinks, no mtime mutation (``utime``), no ``st_nlink``. The writer
  lock becomes a LEASE object (:class:`ObjectLease`) — expiry inside
  the payload, heartbeat by re-PUT — because cross-node pid liveness
  does not exist and object stores cannot touch mtime.

In this sandbox :class:`ObjectFS` runs over the local filesystem, so
"atomic PUT" is emulated with a uniquely-named staging file + one
rename, and "conditional PUT" with a staged ``os.link``. Those renames/
links are EMULATOR internals standing in for guarantees a real store
gives natively at PUT commit; nothing above this interface relies on
rename or link semantics, which is what makes the protocol portable.
CopyObject is emulated as a real byte copy (matching its server-side
cost model), never a hardlink — an ObjectFS snapshot is an independent
object, exactly as it would be on S3.

Backend selection: a lake/view/feed directory carries a tiny
``_fs.json`` marker (``{"kind": "object"}``) written at creation; no
marker means posix. :func:`fs_for` walks up a few levels so files in
``_manifests/`` / ``_snapshots/<tag>/`` resolve to their lake's
backend. Creation-time default comes from ``BCDC_LAKE_FS``.

Crash-window notes for ObjectFS (each primitive is atomic; pairs are
not, and the callers' protocols already tolerate that):

- ``publish`` = CopyObject + DELETE. A crash between the two leaves the
  staged object behind with the final committed — the split/merge
  maintenance resume re-publishes deterministically and delete is
  idempotent (pipelines/cdc.py maintenance markers).
- ``ObjectLease`` assumes loosely synchronized clocks (NTP-level skew
  ≪ lease duration) — the standard lease-protocol assumption.

Reads stay plain paths throughout the engine: Ray Data / pyarrow accept
object-store URIs natively, and in-sandbox both backends materialize as
local files. Re-expresses nothing from the reference (it has no storage
layer at all — ``/root/reference/bcdc2bcdc/CacheFiles.py`` is a local
JSON cache); this is the Ray-Data-native deployment surface.
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import threading
import time
import uuid

KIND_POSIX = "posix"
KIND_OBJECT = "object"
_MARKER = "_fs.json"
_ENV = "BCDC_LAKE_FS"


class LakeLockedError(RuntimeError):
    """The lake is locked by a live writer (also re-exported as
    ``pipelines.cdc.LakeLockedError``)."""


def resolve_kind(kind: str | None = None) -> str:
    """Creation-time backend choice: explicit arg > $BCDC_LAKE_FS > posix."""
    k = kind or os.environ.get(_ENV, KIND_POSIX)
    if k not in (KIND_POSIX, KIND_OBJECT):
        raise ValueError(f"unknown lake fs kind {k!r} (posix|object)")
    return k


def mark_fs(dir_path: str, kind: str) -> None:
    """Persist the backend marker at creation. Posix (the default) writes
    nothing; idempotent for identical kind; refuses flipping an existing
    marker (a lake's backend is part of its committed layout, like the
    partition hash version)."""
    kind = resolve_kind(kind)
    p = os.path.join(dir_path, _MARKER)
    if os.path.exists(p):
        with open(p) as f:
            cur = json.load(f).get("kind", KIND_POSIX)
        if cur != kind:
            raise ValueError(
                f"{dir_path} was created with fs kind {cur!r}; refusing to "
                f"re-mark as {kind!r}"
            )
        return
    if kind == KIND_POSIX:
        return
    os.makedirs(dir_path, exist_ok=True)
    tmp = f"{p}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"kind": kind}, f)
    os.replace(tmp, p)


def fs_kind(dir_path: str) -> str:
    """Backend kind for a directory: nearest ``_fs.json`` marker up to 3
    levels above (covers ``_manifests/``, ``_snapshots/<tag>/_manifests``),
    else posix."""
    d = os.path.abspath(dir_path)
    for _ in range(4):
        p = os.path.join(d, _MARKER)
        if os.path.exists(p):
            try:
                with open(p) as f:
                    return resolve_kind(json.load(f).get("kind"))
            except (OSError, ValueError):
                return KIND_POSIX
        parent = os.path.dirname(d)
        if parent == d:
            break
        d = parent
    return KIND_POSIX


def fs_for(dir_path: str) -> "LakeFS":
    return _OBJECT if fs_kind(dir_path) == KIND_OBJECT else _POSIX


def fs_for_path(file_path: str) -> "LakeFS":
    return fs_for(os.path.dirname(file_path) or ".")


def _fsync_on() -> bool:
    return os.environ.get("BCDC_FSYNC", "0") == "1"


def _fsync_path_and_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    d = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(d)
    finally:
        os.close(d)


class LakeFS:
    """The durability-bearing write interface. Everything the commit
    protocol needs, nothing more:

    - ``put_bytes`` / ``put_json`` / ``put_parquet``: atomic whole-object
      publish — a reader sees the old object, the new object, or nothing;
      never a torn one. Last-writer-wins on overwrite.
    - ``put_if_absent``: atomic create-with-content iff the key does not
      exist (POSIX link-create / object-store If-None-Match PUT).
    - ``publish``: move a staged sibling into its final key, atomic at the
      destination (POSIX rename / CopyObject+DELETE).
    - ``clone``: independent immutable copy for snapshot/restore, atomic at
      the destination, overwrite allowed (hardlink / CopyObject).
    - ``delete`` / ``exclusive_size``: GC support.
    - ``lock``: the writer mutual-exclusion object for this backend.
    """

    kind: str = ""

    # -- atomic publishes ---------------------------------------------------
    def put_bytes(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def put_json(self, path: str, obj) -> None:
        self.put_bytes(path, json.dumps(obj).encode())

    def put_parquet(self, path: str, table) -> None:
        import pyarrow.parquet as pq

        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        pq.write_table(table, tmp)
        self.publish(tmp, path)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        raise NotImplementedError

    def publish(self, staged: str, final: str) -> None:
        raise NotImplementedError

    def clone(self, src: str, dst: str) -> None:
        raise NotImplementedError

    # -- GC / accounting ----------------------------------------------------
    def delete(self, path: str, missing_ok: bool = True) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            if not missing_ok:
                raise

    def exclusive_size(self, path: str) -> int:
        raise NotImplementedError

    # -- mutual exclusion ---------------------------------------------------
    def lock(self, lake_dir: str, stale_after_s: float = 3600.0):
        raise NotImplementedError


class PosixFS(LakeFS):
    """The original rename/hardlink protocol (default)."""

    kind = KIND_POSIX

    def put_bytes(self, path: str, data: bytes) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            if _fsync_on():
                f.flush()
                os.fsync(f.fileno())
        os.replace(tmp, path)
        if _fsync_on():
            _fsync_path_and_dir(path)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        # full payload staged, then one os.link: atomic create-with-content
        # (the O_EXCL-create-then-write torn-lock hole fixed in round 4)
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def publish(self, staged: str, final: str) -> None:
        os.replace(staged, final)
        if _fsync_on():
            _fsync_path_and_dir(final)

    def clone(self, src: str, dst: str) -> None:
        # zero-copy: hardlink to a tmp name, rename over dst (link itself
        # cannot overwrite). Falls back to a byte copy across devices.
        tmp = f"{dst}.tmp-{uuid.uuid4().hex}"
        try:
            os.link(src, tmp)
        except OSError:
            shutil.copy2(src, tmp)
        os.replace(tmp, dst)

    def exclusive_size(self, path: str) -> int:
        st = os.stat(path)
        return st.st_size if st.st_nlink == 1 else 0

    def lock(self, lake_dir: str, stale_after_s: float = 3600.0):
        from ..pipelines.cdc import _LakeLock  # noqa: PLC0415 — posix impl lives there

        return _LakeLock(lake_dir, stale_after_s=stale_after_s)


class ObjectFS(LakeFS):
    """Object-store-semantics backend (local emulation; see module doc).

    Every method maps 1:1 to a real-store operation:

    ============== =======================================================
    put_bytes      PUT (atomic at commit — emulated: unique staging + mv)
    put_if_absent  PUT If-None-Match (emulated: staged ``os.link``)
    publish        CopyObject + DELETE (emulated likewise; crash between
                   the two leaves staged+final — caller protocols resume)
    clone          CopyObject (REAL byte copy in the emulator — never a
                   hardlink, matching the server-side cost/independence)
    delete         DELETE
    exclusive_size object size (objects are never shared)
    lock           :class:`ObjectLease`
    ============== =======================================================
    """

    kind = KIND_OBJECT

    def put_bytes(self, path: str, data: bytes) -> None:
        tmp = f"{path}.staging-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # emulator stand-in for atomic PUT commit

    def put_if_absent(self, path: str, data: bytes) -> bool:
        tmp = f"{path}.staging-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)  # emulator stand-in for If-None-Match PUT
            return True
        except FileExistsError:
            return False
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def publish(self, staged: str, final: str) -> None:
        self.clone(staged, final)  # CopyObject
        self.delete(staged)  # DELETE (idempotent on rerun)

    def clone(self, src: str, dst: str) -> None:
        tmp = f"{dst}.staging-{uuid.uuid4().hex}"
        shutil.copyfile(src, tmp)  # server-side copy: real bytes, no inode sharing
        os.replace(tmp, dst)

    def exclusive_size(self, path: str) -> int:
        return os.stat(path).st_size

    def lock(self, lake_dir: str, stale_after_s: float = 3600.0):
        return ObjectLease(lake_dir, lease_s=stale_after_s)


_POSIX = PosixFS()
_OBJECT = ObjectFS()


class ObjectLease:
    """Writer lease for object-store lakes — the rename/link-free analog of
    ``cdc._LakeLock``:

    - acquisition: conditional PUT of ``_lock.json`` holding
      ``{token, holder, lease_s, expires_utc, started_utc}``;
    - heartbeat: the holder re-PUTs the payload with a fresh expiry every
      ``lease_s/4`` (≤ 60 s) from a daemon thread — re-PUT is the only
      "touch" an object store offers (no utime);
    - staleness: purely ``now > expires_utc`` (no cross-node pid probe
      exists); unreadable lease objects get a short grace age, mirroring
      the posix lock (creation is atomic-with-payload, so unreadable means
      a legacy torn write, not a concurrent writer);
    - reclaim: serialized through a conditional-PUT mutex object with its
      own embedded expiry, staleness re-checked under the mutex — exactly
      one winner, never removes a fresh lease;
    - release: verifies the stored token before DELETE.

    Assumes loosely synchronized clocks (skew ≪ lease). Held across the
    mutating section of one replay, like the posix lock.
    """

    _UNREADABLE_GRACE_S = 5.0
    _MUTEX_LEASE_S = 60.0

    def __init__(self, lake_dir: str, lease_s: float = 3600.0):
        self.path = os.path.join(lake_dir, "_lock.json")
        self.lease_s = float(lease_s)
        self._held = False
        self._token = f"{os.getpid()}-{uuid.uuid4().hex}"
        self._hb_stop: threading.Event | None = None

    # -- helpers -------------------------------------------------------------
    def _payload(self) -> bytes:
        now = time.time()
        return json.dumps(
            {
                "token": self._token,
                "holder": f"{socket.gethostname()}:{os.getpid()}",
                "lease_s": self.lease_s,
                "expires_utc": now + self.lease_s,
                "started_utc": now,
            }
        ).encode()

    def _read(self, path: str):
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _is_stale(self) -> bool:
        info = self._read(self.path)
        if info is None:
            try:
                st = os.stat(self.path)
            except OSError:
                return True  # vanished: stale by definition
            return time.time() - st.st_mtime > self._UNREADABLE_GRACE_S
        return time.time() > float(info.get("expires_utc", 0.0))

    def _reclaim(self) -> None:
        mutex = self.path + ".reclaim"
        minfo = self._read(mutex)
        if minfo is not None and time.time() > float(minfo.get("expires_utc", 0.0)):
            _OBJECT.delete(mutex)  # crashed reclaimer's mutex aged out
        mutex_payload = json.dumps(
            {"token": self._token, "expires_utc": time.time() + self._MUTEX_LEASE_S}
        ).encode()
        if not _OBJECT.put_if_absent(mutex, mutex_payload):
            time.sleep(0.05)  # another reclaimer active; retry the loop
            return
        try:
            if self._is_stale():  # re-check UNDER the mutex
                _OBJECT.delete(self.path)
        finally:
            _OBJECT.delete(mutex)

    def _start_heartbeat(self) -> None:
        interval = min(60.0, max(0.25, self.lease_s / 4.0))
        stop = threading.Event()

        def beat():
            while not stop.wait(interval):
                if not os.path.exists(self.path):
                    return  # lease gone (released or lost) — stop quietly
                cur = self._read(self.path)
                if cur is not None and cur.get("token") != self._token:
                    return  # lost the lease — never overwrite the new holder
                _OBJECT.put_bytes(self.path, self._payload())

        t = threading.Thread(target=beat, daemon=True, name="objectlease-hb")
        t.start()
        self._hb_stop = stop

    # -- context manager -----------------------------------------------------
    def __enter__(self):
        for _ in range(4):
            if _OBJECT.put_if_absent(self.path, self._payload()):
                self._held = True
                self._start_heartbeat()
                return self
            if self._is_stale():
                self._reclaim()
                continue
            raise LakeLockedError(
                f"lake is locked by a live writer ({self.path}); "
                "concurrent mutating replays are not allowed"
            )
        raise LakeLockedError(f"could not acquire lake lease {self.path}")

    def __exit__(self, *exc):
        if self._held:
            if self._hb_stop is not None:
                self._hb_stop.set()
            info = self._read(self.path)
            if info is not None and info.get("token") == self._token:
                _OBJECT.delete(self.path)
        return False
