"""Temporal joins Ray Data lacks natively: as-of join and range (interval)
join, built as ONE co-bucketed shuffle + a vectorized per-bucket kernel.

The reference engine has only equality joins (src⋈dest delta candidates,
``/root/reference/bcdc2bcdc/CKANData.py:1468-1502`` — SURVEY §2.6); these
extend the join family to the time-ordered lookups a training-data /
event-stream pipeline needs (attach the latest dimension state as of an
event, window-correlate two event streams).

Scale design (the documented partitioning assumption):
- both inputs are normalized to a COMMON schema (side tag, int64 key,
  int64 time, tiebreak, null-padded payload) and unioned — Ray then needs
  only ONE hash-bucket shuffle of the union instead of co-partitioning two
  datasets separately;
- the bucket is a pure function of the join key (``canonical.key_hash``),
  so a key's left and right rows always land in the same bucket — the
  kernel never needs cross-bucket state;
- per bucket the kernel is numpy-vectorized (lexsort + segmented cummax /
  searchsorted), one Python call per bucket, never per row or per key;
- skew: a single hot KEY concentrates in one bucket — same contract as
  every hash join; salt upstream if one key dominates (the CDC engine's
  ``salt=`` pattern applies unchanged).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..canonical import key_hash, splitmix64

_SENTINEL_TB = np.int64(-(1 << 62))


def _as_int64(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Timestamps/ints → comparable int64 (timestamp[us] casts losslessly)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    elif col.type != pa.int64():
        col = col.cast(pa.int64())
    return col


def union_snap(ds):
    """Two-sided-exchange union, optionally snapped (materialized) before
    the bucket shuffle. Early Ray 2.49 measurements showed UnionOperator
    handing the sort ONE ref bundle and serializing the SortMap (2.6×
    wall); re-measured in round 3 the streaming union ties or WINS (the
    sort parallelizes fine), and streaming is the right 100 TB shape —
    map-side blocks flow into the shuffle instead of pinning the whole
    two-sided input in the object store first. ``SNAP_UNION=True`` restores
    the old barrier if a regression reappears on some Ray point release."""
    return ds.materialize() if SNAP_UNION else ds


SNAP_UNION = False


def _normalize_side(
    batch: pa.Table,
    side: int,
    key: str,
    ts: str,
    keep: list[tuple[str, pa.DataType]],
    tiebreak: str | None,
) -> pa.Table:
    """Project one input onto the common union schema: ``__side`` /
    ``__k`` / ``__t`` / ``__tb`` + every payload column (null-padded where
    the column belongs to the other side)."""
    n = batch.num_rows
    cols: dict[str, pa.Array] = {
        "__side": pa.array(np.full(n, side, np.int8)),
        "__k": _as_int64(batch.column(key)),
        "__t": _as_int64(batch.column(ts)),
        "__tb": (
            _as_int64(batch.column(tiebreak))
            if tiebreak and tiebreak in batch.column_names
            else pa.array(np.full(n, _SENTINEL_TB, np.int64))
        ),
    }
    for name, typ in keep:
        if name in batch.column_names:
            col = batch.column(name)
            cols[name] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        else:
            cols[name] = pa.nulls(n, typ)
    return pa.table(cols)


def _cobucket(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str | None,
    n_buckets: int,
):
    """Union both sides under the common schema and shuffle ONCE on the
    key-hash bucket. Returns (grouped, payload schema info)."""
    lschema, rschema = left.schema(), right.schema()

    def typ(schema, name):
        return schema.base_schema.field(name).type if hasattr(
            schema, "base_schema"
        ) else schema.field(name).type

    keep = [(c, typ(lschema, c)) for c in left_cols] + [
        (c, typ(rschema, c)) for c in right_cols
    ]
    def norm_tag(side, key, ts, tiebreak):
        def fn(b: pa.Table) -> pa.Table:
            out = _normalize_side(b, side, key, ts, keep, tiebreak)
            return out.append_column(
                "__b",
                pa.array((key_hash(out, ["__k"]) % n_buckets).astype("int32")),
            )

        return fn

    lnorm = left.map_batches(
        norm_tag(1, left_key, left_ts, None), batch_format="pyarrow"
    )
    rnorm = right.map_batches(
        norm_tag(0, right_key, right_ts, right_tiebreak), batch_format="pyarrow"
    )
    return union_snap(lnorm.union(rnorm)).groupby("__b")


def _segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    if len(sorted_keys) == 0:
        return np.zeros(0, np.int64)
    change = np.empty(len(sorted_keys), bool)
    change[0] = True
    np.not_equal(sorted_keys[1:], sorted_keys[:-1], out=change[1:])
    return np.flatnonzero(change).astype(np.int64)


def asof_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str | None = None,
    n_buckets: int = 16,
):
    """For every left row, attach the right row of the same key with the
    greatest ``right_ts`` <= ``left_ts`` (ties on ``right_ts`` broken by
    max ``right_tiebreak`` — deterministic, unlike a bare SQL ASOF on
    duplicate timestamps). LEFT-join semantics: unmatched left rows keep
    null payload.

    Kernel: lexsort the bucket by (key, t, side, tiebreak) with right rows
    ordered before left rows at equal t (so an exactly-equal timestamp
    matches), then one segmented ``np.maximum.accumulate`` finds each left
    row's most recent right predecessor — no per-key loop.
    """

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        k = g.column("__k").to_numpy(zero_copy_only=False)
        t = g.column("__t").to_numpy(zero_copy_only=False)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        tb = g.column("__tb").to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, side, t, k))
        ks, sides = k[order], side[order]
        pos = np.arange(len(ks), dtype=np.int64)
        src = np.where(sides == 0, pos, np.int64(-1))
        last_right = np.maximum.accumulate(src)
        starts = _segment_starts(ks)
        seg_len = np.diff(np.append(starts, len(ks)))
        seg_start = np.repeat(starts, seg_len)
        valid = last_right >= seg_start
        left_rows = np.flatnonzero(sides == 1)
        match = np.where(valid[left_rows], last_right[left_rows], np.int64(-1))
        sorted_tbl = g.take(pa.array(order))
        out: dict[str, pa.Array] = {}
        lidx = pa.array(left_rows)
        for c in left_cols:
            out[c] = sorted_tbl.column(c).take(lidx)
        midx = pa.array(
            np.where(match >= 0, match, 0), type=pa.int64()
        )
        null_mask = pa.array(match < 0)
        for c in right_cols:
            taken = sorted_tbl.column(c).take(midx)
            out[c] = pc.if_else(null_mask, pa.nulls(len(match), taken.type), taken)
        return pa.table(out)

    grouped = _cobucket(
        left,
        right,
        left_key=left_key,
        right_key=right_key,
        left_ts=left_ts,
        right_ts=right_ts,
        left_cols=left_cols,
        right_cols=right_cols,
        right_tiebreak=right_tiebreak,
        n_buckets=n_buckets,
    )
    return grouped.map_groups(per_bucket, batch_format="pyarrow")


class _BroadcastAsofKernel:
    """Per-worker state for the broadcast as-of fast path: the right side,
    pre-sorted by (key, t, tiebreak) on the driver, resolved from the object
    store ONCE per worker process (``_cached``), then probed per left batch
    with two vectorized searchsorteds — no shuffle at all."""

    def __init__(self, ref):
        import ray

        d = ray.get(ref)
        self.comp = d["comp"]  # seg*span + time-rank, non-decreasing (ties on
        # duplicate (key, ts) right rows; side='left' search handles them)
        self.starts = d["starts"]  # first right row of each key segment
        self.key_vals = d["key_vals"]  # distinct keys, sorted
        self.uniq_t = d["uniq_t"]  # distinct right times, sorted
        self.span = d["span"]
        self.payload = d["payload"]  # pa.Table of right_cols, same order

    def probe(self, lk: np.ndarray, lt: np.ndarray) -> np.ndarray:
        """Return the right-row index for each left row, -1 if unmatched."""
        seg = np.searchsorted(self.key_vals, lk)
        has_key = (seg < len(self.key_vals)) & (
            self.key_vals[np.minimum(seg, max(len(self.key_vals) - 1, 0))] == lk
        )
        rank_l = np.searchsorted(self.uniq_t, lt, side="right")
        pos = np.searchsorted(self.comp, seg * self.span + rank_l, side="left") - 1
        seg_start = self.starts[np.minimum(seg, max(len(self.starts) - 1, 0))]
        valid = has_key & (pos >= seg_start)
        return np.where(valid, pos, np.int64(-1))


def asof_join_broadcast(
    left,
    right_table: pa.Table,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str | None = None,
):
    """Broadcast fast path for :func:`asof_join` when the right side is a
    small dimension table (rates, config versions, slowly-changing state):
    identical semantics (greatest ``right_ts`` <= ``left_ts`` per key, ties
    broken by max tiebreak, LEFT join), but the big left side STREAMS —
    zero shuffle versus the co-bucketed path's all-to-all exchange. The
    right side is sorted once on the driver, ``ray.put`` once, resolved
    once per worker; each left batch costs two composite searchsorteds.
    Use while the right side fits comfortably in a worker heap (the same
    broadcast-vs-shuffle threshold as the LUT joins, SURVEY §2.6)."""
    import ray

    if right_table.num_rows == 0:
        # degenerate: every left row is unmatched — pure projection
        def all_null(b: pa.Table) -> pa.Table:
            out = {c: b.column(c) for c in left_cols}
            for c in right_cols:
                out[c] = pa.nulls(b.num_rows, right_table.schema.field(c).type)
            return pa.table(out)

        return left.map_batches(all_null, batch_format="pyarrow")

    rk = _as_int64(right_table.column(right_key)).to_numpy(zero_copy_only=False)
    rt = _as_int64(right_table.column(right_ts)).to_numpy(zero_copy_only=False)
    tb = (
        _as_int64(right_table.column(right_tiebreak)).to_numpy(zero_copy_only=False)
        if right_tiebreak
        else np.zeros(len(rk), np.int64)
    )
    order = np.lexsort((tb, rt, rk))
    rk, rt = rk[order], rt[order]
    payload = right_table.select(right_cols).take(pa.array(order)).combine_chunks()
    starts = _segment_starts(rk)
    key_vals = rk[starts]
    seg_of_right = np.cumsum(
        np.concatenate([[0], (rk[1:] != rk[:-1]).astype(np.int64)])
    )
    uniq_t = np.unique(rt)
    span = np.int64(len(uniq_t) + 1)
    comp = seg_of_right * span + np.searchsorted(uniq_t, rt)
    ref = ray.put(
        {
            "comp": comp,
            "starts": starts,
            "key_vals": key_vals,
            "uniq_t": uniq_t,
            "span": span,
            "payload": payload,
        }
    )

    def per_batch(b: pa.Table) -> pa.Table:
        from ..pipelines.queries import _cached

        kern = _cached(_BroadcastAsofKernel, ref)
        lk = _as_int64(b.column(left_key)).to_numpy(zero_copy_only=False)
        lt = _as_int64(b.column(left_ts)).to_numpy(zero_copy_only=False)
        match = kern.probe(lk, lt)
        out: dict[str, pa.Array] = {c: b.column(c) for c in left_cols}
        midx = pa.array(np.where(match >= 0, match, 0), type=pa.int64())
        null_mask = pa.array(match < 0)
        for c in right_cols:
            taken = kern.payload.column(c).take(midx)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            out[c] = pc.if_else(null_mask, pa.nulls(len(match), taken.type), taken)
        return pa.table(out)

    return left.map_batches(per_batch, batch_format="pyarrow")


def range_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    lower_offset: int,
    upper_offset: int,
    n_buckets: int = 16,
):
    """Inner interval join: emit (left, right) for every right row of the
    same key with ``left_ts + lower_offset <= right_ts <= left_ts +
    upper_offset`` (offsets in the time column's native int64 unit, e.g.
    microseconds for timestamp[us]).

    Kernel: right rows sorted by (key, t); each left row's matching span is
    two composite searchsorteds (segment index × dense time rank — no
    per-key loop); the cartesian expansion is a segmented arange. Output
    size is data-dependent — keep the window tight; the expansion never
    leaves the bucket.
    """
    lo_off = np.int64(lower_offset)
    hi_off = np.int64(upper_offset)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        k = g.column("__k").to_numpy(zero_copy_only=False)
        t = g.column("__t").to_numpy(zero_copy_only=False)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        rmask = side == 0
        lmask = ~rmask
        rk, rt = k[rmask], t[rmask]
        lk, lt = k[lmask], t[lmask]
        rorder = np.lexsort((rt, rk))
        rk, rt = rk[rorder], rt[rorder]
        rrows = np.flatnonzero(rmask)[rorder]
        lrows = np.flatnonzero(lmask)
        empty = {
            **{c: pa.nulls(0, g.schema.field(c).type) for c in left_cols},
            **{c: pa.nulls(0, g.schema.field(c).type) for c in right_cols},
        }
        if len(rk) == 0 or len(lk) == 0:
            return pa.table(empty)
        # dense segment index per right row + dense time rank → composite
        # int64 search key (seg * span + rank) that keeps (key, t) order
        starts = _segment_starts(rk)
        key_vals = rk[starts]
        seg_of_right = np.cumsum(
            np.concatenate([[0], (rk[1:] != rk[:-1]).astype(np.int64)])
        )
        times_uniq = np.unique(np.concatenate([rt, lt + lo_off, lt + hi_off]))
        span = np.int64(len(times_uniq) + 2)
        comp_r = seg_of_right * span + np.searchsorted(times_uniq, rt)
        seg_of_left = np.searchsorted(key_vals, lk)
        has_key = (seg_of_left < len(key_vals)) & (
            key_vals[np.minimum(seg_of_left, len(key_vals) - 1)] == lk
        )
        lo_rank = np.searchsorted(times_uniq, lt + lo_off, side="left")
        hi_rank = np.searchsorted(times_uniq, lt + hi_off, side="right")
        lob = np.searchsorted(comp_r, seg_of_left * span + lo_rank, side="left")
        hib = np.searchsorted(comp_r, seg_of_left * span + hi_rank, side="left")
        counts = np.where(has_key, hib - lob, 0)
        total = int(counts.sum())
        if total == 0:
            return pa.table(empty)
        off = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        expand_left = np.repeat(np.arange(len(lk)), counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(off, counts)
        expand_right = np.repeat(lob, counts) + within
        lsel = pa.array(lrows[expand_left])
        rsel = pa.array(rrows[expand_right])
        out: dict[str, pa.Array] = {}
        for c in left_cols:
            out[c] = g.column(c).take(lsel)
        for c in right_cols:
            out[c] = g.column(c).take(rsel)
        return pa.table(out)

    grouped = _cobucket(
        left,
        right,
        left_key=left_key,
        right_key=right_key,
        left_ts=left_ts,
        right_ts=right_ts,
        left_cols=left_cols,
        right_cols=right_cols,
        right_tiebreak=None,
        n_buckets=n_buckets,
    )
    return grouped.map_groups(per_bucket, batch_format="pyarrow")


def hash_join(
    left,
    right,
    *,
    on: list[str],
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    n_buckets: int = 16,
    hot_keys: list | None = None,
    salt: int = 8,
):
    """Generic LARGE ⋈ LARGE equi-join: both sides shuffled ONCE on the
    key-hash bucket, then one Arrow (acero) hash join per bucket.

    The complement of the broadcast join family (``_BroadcastJoin``,
    ``asof_join_broadcast``): use THIS when neither side fits a worker
    heap. Same scale contract as the temporal joins above — the bucket is
    a pure function of the join key, so matching rows co-locate and the
    per-bucket kernel needs no cross-bucket state; the per-bucket join
    itself is Arrow's vectorized C++ hash join, one Python dispatch per
    bucket. Composite (multi-column) keys are supported: bucketing hashes
    all of ``on``; the join compares the original column values, so hash
    collisions cannot produce false matches.

    ``how``: "inner", "left outer" or "full outer" (Arrow join_type
    names). Full outer keeps unmatched rows from BOTH sides (keys
    coalesce), and is bucket-correct for the same reason the others are —
    a key lives in exactly one bucket, so "unmatched in my bucket" is
    "unmatched globally". It cannot combine with salting: a replicated
    hot build row would emit one spurious unmatched copy per sub-key.

    Skew: pass ``hot_keys`` (values of the single join column flagged by
    ``heavy_hitters``) to salt them — hot LEFT rows spread over ``salt``
    sub-keys by a deterministic content hash, hot RIGHT rows replicate
    once per sub-key, and the bucket/join key becomes (key, __salt), so
    the hot key's work fans out over up to ``salt`` buckets instead of
    one. Left rows are never duplicated and each sees exactly one right
    copy, so inner and left-outer results are identical to the unsalted
    join (property-tested). Without ``hot_keys``, one hot key
    concentrates in one bucket — the standard hash-join contract.
    """
    if hot_keys is not None and len(on) != 1:
        raise ValueError("hot_keys salting supports single-column joins")
    if hot_keys is not None and how == "full outer":
        raise ValueError(
            "full outer cannot be salted: replicated hot build rows would "
            "emit one spurious unmatched copy per sub-key"
        )
    lschema, rschema = left.schema(), right.schema()

    def typ(schema, name):
        return schema.base_schema.field(name).type if hasattr(
            schema, "base_schema"
        ) else schema.field(name).type

    keep = (
        [(c, typ(lschema, c)) for c in on]
        + [(c, typ(lschema, c)) for c in left_cols]
        + [(c, typ(rschema, c)) for c in right_cols]
    )
    out_schema = pa.schema(keep)
    hot_set = pa.array(list(hot_keys)) if hot_keys else None
    join_keys = on if hot_set is None else on + ["__salt"]
    carried = [n for n, _ in keep]

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols: dict[str, pa.Array] = {
                "__side": pa.array(np.full(n, side, np.int8))
            }
            for name, t in keep:
                if name in b.column_names:
                    c = b.column(name)
                    cols[name] = (
                        c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                    )
                else:
                    cols[name] = pa.nulls(n, t)
            out = pa.table(cols)
            if hot_set is not None:
                is_hot = pc.fill_null(
                    pc.is_in(out.column(on[0]), value_set=hot_set), False
                ).to_numpy(zero_copy_only=False)
                if side == 1:
                    # spread hot probe rows by a deterministic content hash
                    salts = (splitmix64(key_hash(out, carried)) % salt).astype(
                        np.int64
                    )
                    out = out.append_column(
                        "__salt", pa.array(np.where(is_hot, salts, 0))
                    )
                else:
                    # replicate hot build rows once per sub-key (salt 0 is
                    # the base copy every row already has)
                    parts = [
                        out.append_column(
                            "__salt", pa.array(np.zeros(n, np.int64))
                        )
                    ]
                    hot_idx = np.flatnonzero(is_hot)
                    if len(hot_idx):
                        hot_tbl = out.take(pa.array(hot_idx))
                        for s in range(1, salt):
                            parts.append(
                                hot_tbl.append_column(
                                    "__salt",
                                    pa.array(np.full(len(hot_idx), s, np.int64)),
                                )
                            )
                    out = pa.concat_tables(parts)
            return out.append_column(
                "__b",
                pa.array((key_hash(out, join_keys) % n_buckets).astype("int32")),
            )

        return fn

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.take(pa.array(np.flatnonzero(side == 1))).select(
            join_keys + left_cols
        )
        rt = g.take(pa.array(np.flatnonzero(side == 0))).select(
            join_keys + right_cols
        )
        joined = lt.join(rt, keys=join_keys, join_type=how)
        return joined.select(carried).cast(out_schema)

    lnorm = left.map_batches(tag(1), batch_format="pyarrow")
    rnorm = right.map_batches(tag(0), batch_format="pyarrow")
    grouped = union_snap(lnorm.union(rnorm)).groupby("__b")
    return grouped.map_groups(per_bucket, batch_format="pyarrow")


def broadcast_join(
    left,
    right_table: pa.Table,
    *,
    on: list[str],
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
):
    """Broadcast hash join against a small in-memory right side: the table
    is ``ray.put`` once, resolved once per worker process, and every left
    batch runs Arrow's native hash join against it — the big side STREAMS,
    zero shuffle. Same column contract as :func:`hash_join`
    (``on + left_cols + right_cols``); ``how`` is "inner" or "left outer".
    Use while the right side fits a worker heap (the J5/ST2 broadcast-LUT
    pattern, SURVEY §2.6). Full outer is NOT supported: each left batch
    would re-emit the whole right side's unmatched rows, duplicating them
    once per block — use :func:`hash_join`."""
    import ray

    if how not in ("inner", "left outer"):
        raise ValueError(
            f"broadcast_join supports inner/left outer, not {how!r}: a "
            "per-batch full outer would duplicate unmatched right rows "
            "once per left block"
        )

    small = right_table.select(on + right_cols).combine_chunks()
    ref = ray.put(small)
    carried = on + left_cols + right_cols

    class _Kernel:
        def __init__(self, r):
            self.small = ray.get(r)

        def __call__(self, b: pa.Table) -> pa.Table:
            out = b.select(on + left_cols).join(
                self.small, keys=on, join_type=how
            )
            return out.select(carried)

    def per_batch(b: pa.Table) -> pa.Table:
        from ..pipelines.queries import _cached

        return _cached(_Kernel, ref)(b)

    return left.map_batches(per_batch, batch_format="pyarrow")


# broadcast when the build side is under this — a few worker-heap percent
BROADCAST_THRESHOLD_BYTES = 64 << 20


def auto_join(
    left,
    right,
    *,
    on: list[str],
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    n_buckets: int = 16,
    broadcast_threshold: int = BROADCAST_THRESHOLD_BYTES,
    salt: int = 8,
    detect_k: int = 16,
):
    """Physical-join planner: materialize the right side once (into the
    object store — the shuffle path needs that snap anyway for the Ray
    2.49 union workaround), read its now-exact size, then pick:

    - ≤ ``broadcast_threshold`` → :func:`broadcast_join` (big side
      streams, zero shuffle);
    - larger → :func:`skew_join` (co-bucket shuffle with automatic
      heavy-hitter salting), reusing the already-materialized right side —
      the size probe is never a wasted pass.

    The two plans are result-identical (property-tested), so the choice is
    purely physical — the 100 TB analog of a cost-based join strategy.
    """
    mright = right.materialize()
    size = mright.size_bytes() or 0
    # full outer can't broadcast (per-block unmatched-right duplication) —
    # the shuffle plan is the only correct physical plan for it
    if how != "full outer" and size <= broadcast_threshold:
        blocks = [b for b in mright.to_arrow_refs()]
        import ray

        tables = [t for t in ray.get(blocks) if t.num_columns > 0]
        if tables:
            tbl = pa.concat_tables(tables)
        else:
            # Dataset.schema() is Ray's wrapper; unwrap to the Arrow schema
            schema = mright.schema()
            tbl = getattr(schema, "base_schema", schema).empty_table()
        return broadcast_join(
            left,
            tbl,
            on=on,
            left_cols=left_cols,
            right_cols=right_cols,
            how=how,
        )
    return skew_join(
        left,
        mright,
        on=on,
        left_cols=left_cols,
        right_cols=right_cols,
        how=how,
        n_buckets=n_buckets,
        salt=salt,
        detect_k=detect_k,
    )


def semi_join(
    left,
    right,
    *,
    on: list[str],
    left_cols: list[str],
    anti: bool = False,
    n_buckets: int = 16,
    bloom_bits: int | None = None,
    bloom_hashes: int = 5,
):
    """Distributed semi / anti join: keep left rows that have (``anti=False``)
    or lack (``anti=True``) a key match on the right — SQL ``WHERE [NOT]
    EXISTS``. Join columns must share names across sides (rename upstream).
    Output columns are exactly ``left_cols``.

    Exact path: right side is projected to its key columns and
    per-batch-deduplicated (a distinct combiner — the shuffle moves
    O(distinct keys per block), not rows), both sides co-bucket on the key
    hash, and each bucket runs Arrow's native ``left semi`` / ``left anti``
    hash join — value comparison, so bucket-hash collisions cannot
    false-match. Null keys never match (SQL ``IN`` / ``NOT EXISTS``
    equality semantics).

    ``bloom_bits`` enables the Bloom prefilter (``functions.bloom``):

    - semi: probe rows that MISS the filter are definite non-matches and
      are dropped before the shuffle — at 100 TB this is the difference
      between shuffling the whole fact table and shuffling only the
      selective slice; false positives pass through and the exact join
      removes them.
    - anti: a miss is PROOF of absence, so missing rows bypass the shuffle
      entirely and are emitted directly; only the (small) maybe-present
      slice takes the exact anti join. Results identical either way
      (property-tested).
    """
    keyset = [c for c in on]
    payload = [c for c in left_cols if c not in keyset]
    carried = keyset + payload
    lschema = left.schema()

    def typ(name):
        return lschema.base_schema.field(name).type if hasattr(
            lschema, "base_schema"
        ) else lschema.field(name).type

    def project_left(b: pa.Table) -> pa.Table:
        return b.select(left_cols)

    def distinct_keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(keyset)
        return b.select(keyset).group_by(keyset).aggregate([])

    bloom_ref = None
    if bloom_bits is not None:
        from ..functions.bloom import bloom_filter_batches, build_bloom

        bloom_ref = build_bloom(
            right.map_batches(distinct_keys, batch_format="pyarrow"),
            keyset,
            num_bits=bloom_bits,
            num_hashes=bloom_hashes,
        )

    probe = left
    definite = None
    if bloom_ref is not None:
        from ..functions.bloom import bloom_filter_batches

        if anti:
            # definite non-matches skip the shuffle entirely
            definite = bloom_filter_batches(
                left, bloom_ref, keyset, keep_maybe=False
            ).map_batches(project_left, batch_format="pyarrow")
        probe = bloom_filter_batches(left, bloom_ref, keyset, keep_maybe=True)

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            if side == 1:
                out = b.select([c for c in carried if c in b.column_names])
                for c in carried:
                    if c not in out.column_names:
                        out = out.append_column(c, pa.nulls(n, typ(c)))
                out = out.select(carried)
            else:
                out = distinct_keys(b)
                for c in payload:
                    out = out.append_column(
                        c, pa.nulls(out.num_rows, typ(c))
                    )
            out = out.append_column(
                "__side", pa.array(np.full(out.num_rows, side, np.int8))
            )
            return out.append_column(
                "__b",
                pa.array((key_hash(out, keyset) % n_buckets).astype("int32")),
            )

        return fn

    join_type = "left anti" if anti else "left semi"
    out_schema = pa.schema([(c, typ(c)) for c in left_cols])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.take(pa.array(np.flatnonzero(side == 1))).select(carried)
        rt = (
            g.take(pa.array(np.flatnonzero(side == 0)))
            .select(keyset)
            .group_by(keyset)
            .aggregate([])
        )
        return lt.join(rt, keys=keyset, join_type=join_type).select(
            left_cols
        ).cast(out_schema)

    lnorm = probe.map_batches(tag(1), batch_format="pyarrow")
    rnorm = right.map_batches(tag(0), batch_format="pyarrow")
    exact = (
        union_snap(lnorm.union(rnorm))
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return exact if definite is None else exact.union(definite)


def detect_hot_keys(
    ds, key: str, n_buckets: int, k: int = 16
) -> list:
    """Skew detector for ``hash_join``: the keys whose row count exceeds a
    bucket's fair share (total / n_buckets) — i.e. the keys that would
    concentrate more than one bucket's worth of work. Built on the
    ``heavy_hitters`` combiner (per-batch partial counts → one bucketed
    top-k), so the detection pass shuffles O(distinct keys) partial rows
    and the driver only ever holds ≤ k candidate rows."""
    from ..functions.sketch import heavy_hitters

    def const_group(b: pa.Table) -> pa.Table:
        return b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8)))

    tagged = ds.map_batches(const_group, batch_format="pyarrow")
    hh = heavy_hitters(tagged, "__g", key, k).to_pandas()
    total = int(hh["n"].sum()) if len(hh) else 0
    # total from the top-k alone UNDERcounts the true total, which only
    # makes the threshold conservative (fewer keys flagged) — acceptable:
    # a missed lukewarm key costs one slow bucket, a false flag costs a
    # build-side replication. Use ds.count() when an exact total is cheap.
    fair = max(1, total // max(1, n_buckets))
    return hh.loc[hh["n"] > fair, key].tolist()


def skew_join(
    left,
    right,
    *,
    on: list[str],
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    n_buckets: int = 16,
    salt: int = 8,
    detect_k: int = 16,
):
    """``hash_join`` with automatic hot-key salting: run the heavy-hitter
    detector over the probe side, then salt whatever keys exceed a
    bucket's fair share. One extra aggregation pass over the probe side
    (O(distinct keys) shuffle), identical results to the plain join."""
    saltable = len(on) == 1 and how != "full outer"
    hot = detect_hot_keys(left, on[0], n_buckets, k=detect_k) if saltable else []
    return hash_join(
        left,
        right,
        on=on,
        left_cols=left_cols,
        right_cols=right_cols,
        how=how,
        n_buckets=n_buckets,
        hot_keys=hot or None,
        salt=salt,
    )
