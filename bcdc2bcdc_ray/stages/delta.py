"""Vectorized delta classification: ADD / UPDATE / DELETE / NOOP.

The Ray-native re-expression of the reference's delta algorithm
(``/root/reference/bcdc2bcdc/CKANData.py:1468-1502`` ``getDelta``; key-set
ops at ``CKANData.py:1367-1466`` = SURVEY §2.4 J1–J3) with the per-record
deep diff (``Diff.py:48-53``) replaced by content-hash equality (§2.7 D4):

- ``reduce_lww``      — per merge key keep only the max-LSN event
                        (last-writer-wins; the reference's per-key index
                        lookup generalized to an ordered stream);
- ``classify_delta``  — full outer join of current partition state with the
                        reduced events; key only in events → ADD (J2), delete
                        event on existing key → DELETE (J3), both present &
                        hash differs → UPDATE (J1), hash equal → NOOP (D4);
- ``apply_delta`` / ``merge_partition`` — produce the new partition table,
  sorted by key (the determinism contract, §2.6 O1), plus counters
  (§2.5 A2).

All functions are pure ``pa.Table -> pa.Table`` — they run inside the merge
writer's per-partition ``map_groups`` call, so every operation here is
single-partition-local; the only cluster-wide data movement is the one
``groupby(part)`` shuffle of the (small) change stream, never of the lake.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..canonical import HASH_COL, add_content_hash
from ..spec import TableSpec
from . import evolve

OP_COL = "__op"
PRE_HASH_COL = "__h_inc_pre"  # precomputed incoming hash (AssignPartition)
META_COLS = ("lsn", "op")

# op codes (int8 for cheap masks)
ADD, UPDATE, DELETE, NOOP, KEEP = 1, 2, 3, 4, 0


def reduce_lww(events: pa.Table, key: Sequence[str], lsn_col: str = "lsn") -> pa.Table:
    """Keep the max-LSN event per merge key.

    Sort descending by LSN once, then a vectorized first-occurrence mask over
    the key columns (pandas ``duplicated`` C kernel on just the key columns —
    the payload columns are filtered in Arrow, zero-copy).
    """
    if events.num_rows == 0:
        return events
    t = events.sort_by([(lsn_col, "descending")])
    kdf = t.select(list(key)).to_pandas()
    mask = ~kdf.duplicated(keep="first").to_numpy()
    return t.filter(pa.array(mask))


def filter_ignored(events: pa.Table, spec: TableSpec) -> pa.Table:
    """Drop events touching ignored keys (the reference's ignore_list filter,
    ``/root/reference/bcdc2bcdc/CKANUpdate.py:85-117`` — SURVEY §2.2 M9)."""
    if not spec.ignore_keys or events.num_rows == 0:
        return events
    col = events.column(spec.key[0])
    mask = pc.is_in(col, value_set=pa.array(sorted(spec.ignore_keys), type=col.type))
    return events.filter(pc.invert(pc.fill_null(mask, False)))


def _compare_columns(schema: pa.Schema, spec: TableSpec) -> list[str]:
    """Columns hashed for change detection: the spec's compare set plus any
    evolved (new) columns, in unified-schema order."""
    base = set(spec.compare_cols())
    skip = set(spec.key) | set(META_COLS) | {OP_COL}
    out = []
    for name in schema.names:
        if name in skip or name.startswith("__"):
            continue
        if spec.compare_columns is None or name in base or name not in spec.schema.names:
            out.append(name)
    return out


def classify_delta(
    current: pa.Table, events_lww: pa.Table, spec: TableSpec
) -> tuple[pa.Table, pa.Schema]:
    """Full-outer join current state with LWW-reduced events; emit one row per
    key with an int8 ``__op`` column and both sides' payloads.

    Returns (joined, unified_data_schema). The unified schema is the
    schema-evolution result: column union + permissive type widening
    (SURVEY §7 step 6).
    """
    key = list(spec.key)
    # stored-hash fast path: lake partitions persist the content hash of
    # every row (written by apply) plus the column list it covers in schema
    # metadata — re-hashing the (large) current side on every replay was the
    # single biggest CPU cost of the merge. The stored hash is reused only
    # when its column list matches this merge's compare set (schema
    # evolution invalidates it → recompute once, persist the new hashes).
    stored_hashes = None
    stored_cols = None
    falsy_ok = True
    if HASH_COL in current.column_names:
        meta = current.schema.metadata or {}
        hc = meta.get(b"hash_cols")
        if hc is not None:
            import json as _json

            stored_cols = _json.loads(hc)
            fc = meta.get(b"falsy_cols")
            # the stored hash is only reusable under the SAME falsy
            # canonicalization it was computed with (files written before
            # falsy_cols was persisted carry no marker — assume the spec's,
            # today's behavior)
            if fc is not None:
                falsy_ok = _json.loads(fc) == list(spec.falsy_null_columns)
        stored_hashes = current.column(HASH_COL)
        current = current.drop_columns([HASH_COL])
    # incoming-side fast path: AssignPartition precomputes the content hash
    # in the WIDE map stage (whole-cluster parallel) for non-evolved,
    # hook-free batches; reuse it here instead of hashing inside the
    # (CPU-pinned) writer actor. Valid only when this merge's compare set
    # equals the spec-level one — i.e. no new columns arrived in the group.
    pre_hashes = None
    if PRE_HASH_COL in events_lww.column_names:
        pre_hashes = events_lww.column(PRE_HASH_COL)
        events_lww = events_lww.drop_columns([PRE_HASH_COL])
    ev_data = events_lww.drop_columns(
        [c for c in ("op",) if c in events_lww.column_names]
    )
    data_schema = evolve.unify(
        current.schema,
        pa.schema(
            [
                f
                for f in ev_data.schema
                if f.name != "lsn" and not f.name.startswith("__")
            ]
        ),
    )
    data_schema = pa.schema([f for f in data_schema if f.name != "lsn"])

    cur = evolve.conform(current, data_schema)
    cmp_cols = _compare_columns(data_schema, spec)
    if stored_hashes is not None and stored_cols == list(cmp_cols) and falsy_ok:
        cur = cur.append_column("__h_cur", stored_hashes)
    else:
        cur = add_content_hash(cur, cmp_cols, spec.falsy_null_columns, "__h_cur")

    inc = evolve.conform(
        events_lww.drop_columns([c for c in ("op", "lsn") if c in events_lww.column_names]),
        data_schema,
    )
    if (
        pre_hashes is not None
        and pre_hashes.null_count == 0
        and list(cmp_cols) == list(_compare_columns(spec.schema, spec))
    ):
        inc = inc.append_column("__h_inc", pre_hashes)
    else:
        inc = add_content_hash(inc, cmp_cols, spec.falsy_null_columns, "__h_inc")
    # carry op + lsn through, renamed so the join can't collide
    inc = inc.append_column("__ev_del", pc.equal(events_lww.column("op"), "delete"))
    inc = inc.append_column("__lsn", events_lww.column("lsn"))
    inc = inc.rename_columns(
        [n if n in key or n.startswith("__") else f"__in_{n}" for n in inc.column_names]
    )

    joined = cur.join(inc, keys=key, join_type="full outer")

    has_cur = pc.is_valid(joined.column("__h_cur"))
    has_inc = pc.is_valid(joined.column("__h_inc"))
    is_del = pc.fill_null(joined.column("__ev_del"), False)
    same = pc.fill_null(
        pc.equal(joined.column("__h_cur"), joined.column("__h_inc")), False
    )

    n = joined.num_rows
    op = np.full(n, KEEP, dtype=np.int8)
    hc = has_cur.to_numpy(zero_copy_only=False)
    hi = has_inc.to_numpy(zero_copy_only=False)
    dl = is_del.to_numpy(zero_copy_only=False)
    sm = same.to_numpy(zero_copy_only=False)
    op[hi & ~dl & ~hc] = ADD
    op[hi & ~dl & hc & ~sm] = UPDATE
    op[hi & ~dl & hc & sm] = NOOP
    op[hi & dl & hc] = DELETE
    op[hi & dl & ~hc] = NOOP  # delete of absent key — nothing to do
    joined = joined.append_column(OP_COL, pa.array(op, pa.int8()))
    return joined, data_schema


def apply_delta(joined: pa.Table, data_schema: pa.Schema, spec: TableSpec) -> pa.Table:
    """Materialize the new partition state from the classified join output:
    ADD/UPDATE take the incoming payload, KEEP/NOOP retain the current one,
    DELETE rows drop. Output sorted by merge key (O1 determinism)."""
    op = joined.column(OP_COL)
    take_inc = pc.is_in(op, value_set=pa.array([ADD, UPDATE], pa.int8()))
    keep_row = pc.invert(pc.is_in(op, value_set=pa.array([DELETE], pa.int8())))
    # delete-of-absent NOOPs have no current payload either — drop them too
    keep_row = pc.and_(keep_row, pc.or_(pc.is_valid(joined.column("__h_cur")), take_inc))

    cols = {}
    for fld in data_schema:
        if fld.name in spec.key:
            cols[fld.name] = joined.column(fld.name)
        else:
            cols[fld.name] = pc.if_else(
                take_inc,
                joined.column(f"__in_{fld.name}"),
                joined.column(fld.name),
            )
    out = pa.table(cols, schema=data_schema).filter(keep_row)
    if spec.add_conflict_column and spec.add_conflict_column in out.column_names:
        ops_kept = joined.column(OP_COL).filter(keep_row)
        out = _resolve_add_conflicts(out, ops_kept, spec)
    return out.sort_by([(k, "ascending") for k in spec.key])


def _resolve_add_conflicts(out: pa.Table, ops: pa.ChunkedArray, spec: TableSpec) -> pa.Table:
    """ADD-conflict resolution (the reference's username-conflict
    retry-rename, ``/root/reference/bcdc2bcdc/CKANUpdate.py:153-189``):
    an ADD whose ``add_conflict_column`` value collides with an existing
    row's — or an earlier ADD's — gets a new value from the policy hook
    (default: smallest free ``value-k`` numeric suffix). Vectorized
    pre-filter; Python only touches the (rare) conflicting rows."""
    col = spec.add_conflict_column
    vals = out.column(col)
    op_np = ops.to_numpy(zero_copy_only=False) if isinstance(ops, pa.ChunkedArray) else np.asarray(ops)
    is_add = op_np == ADD
    if not is_add.any():
        return out
    existing = vals.filter(pa.array(~is_add))
    conflict = pc.fill_null(
        pc.is_in(vals, value_set=existing.combine_chunks()), False
    ).to_numpy(zero_copy_only=False)
    # duplicates among the ADDs themselves (first occurrence keeps the name)
    vl = vals.to_pylist()
    seen: set = set()
    dup_add = np.zeros(len(vl), dtype=bool)
    for i in np.flatnonzero(is_add):
        v = vl[i]
        if v is None:
            continue
        if v in seen:
            dup_add[i] = True
        seen.add(v)
    conflicted = np.flatnonzero(is_add & (conflict | dup_add))
    if len(conflicted) == 0:
        return out
    taken = {v for v in vl if v is not None}
    resolver = spec.on_add_conflict
    for i in conflicted:
        v = vl[i]
        if v is None:
            continue
        if resolver is not None:
            nv = resolver(v, taken)
        else:
            k = 1
            while f"{v}-{k}" in taken:
                k += 1
            nv = f"{v}-{k}"
        vl[i] = nv
        taken.add(nv)
    return out.set_column(
        out.column_names.index(col), col, pa.array(vl, type=vals.type)
    )


def change_feed(
    joined: pa.Table,
    data_schema: pa.Schema,
    spec: TableSpec,
    before: bool = False,
) -> pa.Table:
    """Materialize the partition's OUTBOUND change feed from the classified
    join: one WAL-shaped row per ADD/UPDATE/DELETE — ``(lsn, op, *key,
    *data)`` with the incoming payload for add/update and null payload for
    delete. NOOP/KEEP rows are excluded, so the no-op suppression the
    content hash buys (the reference's dataCache/diff pattern,
    ``bcdc2bcdc/CKANData.py:1426-1466``) propagates to every downstream
    consumer: the feed is exactly what CHANGED, already deduplicated and
    LWW-reduced. Because the shape matches the inbound WAL, the feed can
    chain straight into another engine's ``replay`` (CDC fan-out) —
    pinned by test_change_feed_chains_to_identical_lake.

    ``before=True`` additionally emits the PRE-IMAGE of every non-key data
    column as ``before_<col>`` (null for adds) — a Debezium-style
    before/after envelope. Pre-images make the feed sufficient for
    downstream INCREMENTAL aggregation (``pipelines/view.py``): an
    update's/delete's old contribution can be retracted without consulting
    the lake. They are free to produce — the classified join already holds
    the lake side of every changed row."""
    op = joined.column(OP_COL)
    emit = pc.is_in(op, value_set=pa.array([ADD, UPDATE, DELETE], pa.int8()))
    sel = joined.filter(emit)
    op_np = sel.column(OP_COL).to_numpy(zero_copy_only=False)
    names = np.empty(len(op_np), dtype=object)
    names[op_np == ADD] = "add"
    names[op_np == UPDATE] = "update"
    names[op_np == DELETE] = "delete"
    is_del = op_np == DELETE
    cols: dict = {
        "lsn": sel.column("__lsn"),
        "op": pa.array(names, pa.string()),
    }
    for fld in data_schema:
        if fld.name in spec.key:
            cols[fld.name] = sel.column(fld.name)
        else:
            # incoming payload; nulled for deletes (consumers key-route them)
            cols[fld.name] = pc.if_else(
                pa.array(~is_del),
                sel.column(f"__in_{fld.name}"),
                pa.nulls(len(op_np), fld.type),
            )
    fields = [("lsn", pa.int64()), ("op", pa.string())] + [
        (f.name, f.type) for f in data_schema
    ]
    if before:
        # pre-image of the lake side: the full-outer join leaves these null
        # for ADD rows (no lake side existed), which is exactly the envelope
        # contract — no masking needed
        for fld in data_schema:
            if fld.name not in spec.key:
                cols[f"before_{fld.name}"] = sel.column(fld.name)
                fields.append((f"before_{fld.name}", fld.type))
    return pa.table(cols, schema=pa.schema(fields)).sort_by(
        [("lsn", "ascending")] + [(k, "ascending") for k in spec.key]
    )


def delta_counts(joined: pa.Table) -> dict:
    """adds/updates/deletes/noops counters — the reference's
    ``CKANDataSetDeltas.__str__`` report (§2.5 A2)."""
    op = joined.column(OP_COL)

    def cnt(code: int) -> int:
        return int(pc.sum(pc.cast(pc.equal(op, code), pa.int64())).as_py() or 0)

    return {
        "adds": cnt(ADD),
        "updates": cnt(UPDATE),
        "deletes": cnt(DELETE),
        "noops": cnt(NOOP),
    }


def apply_delta_with_hash(
    joined: pa.Table, data_schema: pa.Schema, spec: TableSpec
) -> pa.Table:
    """apply_delta + the persisted-hash column: every output row carries its
    content hash (ADD/UPDATE take the incoming hash, KEEP/NOOP the current
    one — zero extra hashing) and the schema metadata records which columns
    the hash covers, so the next replay's classify skips re-hashing the
    whole current side."""
    import json as _json

    op = joined.column(OP_COL)
    take_inc = pc.is_in(op, value_set=pa.array([ADD, UPDATE], pa.int8()))
    row_hash = pc.if_else(take_inc, joined.column("__h_inc"), joined.column("__h_cur"))
    # rebuild apply_delta's row selection so the hash rows align
    keep_row = pc.invert(pc.is_in(op, value_set=pa.array([DELETE], pa.int8())))
    keep_row = pc.and_(
        keep_row, pc.or_(pc.is_valid(joined.column("__h_cur")), take_inc)
    )
    out = apply_delta(joined, data_schema, spec)
    # apply_delta sorts by key; sort the hash rows identically
    cmp_cols = _compare_columns(data_schema, spec)
    hsel = pa.table(
        {k: joined.column(k) for k in spec.key} | {HASH_COL: row_hash}
    ).filter(keep_row).sort_by([(k, "ascending") for k in spec.key])
    out = out.append_column(HASH_COL, hsel.column(HASH_COL))
    # the hash's FULL context travels with it: column list AND falsy rule.
    # A later reader (classify fast path, fsck) recomputing with a
    # different falsy canonicalization would flag or phantom-update rows
    # whose raw text is '' / 'None' — context-independence is a hard
    # invariant of stored hashes (see canonical.py null-fill note).
    return out.replace_schema_metadata(
        {
            b"hash_cols": _json.dumps(list(cmp_cols)).encode(),
            b"falsy_cols": _json.dumps(list(spec.falsy_null_columns)).encode(),
        }
    )


def merge_partition(
    current: pa.Table,
    events: pa.Table,
    spec: TableSpec,
    persist_hash: bool = False,
    changes: bool = False,
    changes_before: bool = False,
):
    """One partition's full merge: ignore-filter → LWW reduce → classify →
    apply. Returns (new_state sorted by key, counters); with
    ``changes=True`` returns (new_state, counters, change_feed) — the
    WAL-shaped outbound feed of what this merge actually changed (feed
    values are the pre-``on_apply``-hook payload, same caveat as the
    persist_hash path).

    ``persist_hash=True`` (the merge writer's path) keeps the internal
    ``__content_hash`` column + its schema metadata on the output so the
    NEXT replay classifies against stored hashes instead of re-hashing the
    whole current side."""
    events = filter_ignored(events, spec)
    for hook in spec.on_compare:
        events = hook(events)
    lww = reduce_lww(events, spec.key)
    joined, data_schema = classify_delta(current, lww, spec)
    if persist_hash and not spec.on_apply:
        new_state = apply_delta_with_hash(joined, data_schema, spec)
    else:
        # post-merge hooks may mutate payload columns → a stored hash would
        # go stale; plain output (hash recomputed on the next replay)
        new_state = apply_delta(joined, data_schema, spec)
        for hook in spec.on_apply:
            new_state = hook(new_state)
    if changes:
        return (
            new_state,
            delta_counts(joined),
            change_feed(joined, data_schema, spec, before=changes_before),
        )
    return new_state, delta_counts(joined)
