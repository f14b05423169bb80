"""Vectorized per-batch transforms — the reference's normalizer/fixup zoo.

Each function here re-expresses one of the reference's per-record custom
transformers (SURVEY §2.2 M1–M22, ``/root/reference/bcdc2bcdc/CustomTransformers.py``)
as a pure ``pa.Table -> pa.Table`` Arrow-kernel transform suitable for
``map_batches(fn, batch_format="pyarrow")``. No Python row loops anywhere —
every body is one or a few pyarrow.compute calls.

The reference applies these via a reflection-based registry
(``CustomTransformers.py:24-120`` MethodMapping); here they are plain
composable functions, bound to a table via ``TableSpec.on_compare/on_apply``
hook tuples or used directly in query pipelines.
"""

from __future__ import annotations

import json
from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _set(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


def project(batch: pa.Table, columns: Sequence[str]) -> pa.Table:
    """M1/M11 — keep only the configured columns (user-field projection /
    drop-field transform, ``CKANData.py:173-263``, ``CustomTransformers.py:177-187``)."""
    return batch.select([c for c in columns if c in batch.column_names])


def fill_defaults(batch: pa.Table, defaults: Mapping[str, object]) -> pa.Table:
    """M3 — required-defaults fill (``CKANData.py:1789-1885`` DataPopulator):
    nulls in the named columns become the configured default."""
    for col, dflt in defaults.items():
        if col in batch.column_names:
            batch = _set(batch, col, pc.fill_null(batch.column(col), dflt))
    return batch


def enforce_types(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """M4 — type enforcement / widening cast (``CKANData.py:966-1022``)."""
    for fld in schema:
        if fld.name in batch.column_names:
            col = batch.column(fld.name)
            if col.type != fld.type:
                batch = _set(batch, fld.name, col.cast(fld.type))
    return batch


def value_map(
    batch: pa.Table, col: str, mapping: Mapping[str, str], default: str | None = None
) -> pa.Table:
    """M14 — security-class-style value remap (``CustomTransformers.py:601-637``):
    values in ``mapping`` are replaced; others become ``default`` if given,
    else pass through. Dictionary-encode + take → O(distinct) python work."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dict_arr = pc.dictionary_encode(arr)
    uniques = dict_arr.dictionary.to_pylist()
    remapped = pa.array(
        [
            mapping.get(u, u if default is None else default) if u is not None else None
            for u in uniques
        ],
        type=arr.type,
    )
    return _set(batch, col, remapped.take(dict_arr.indices))


def domain_clamp(
    batch: pa.Table, col: str, allowed: Sequence[str], default: str
) -> pa.Table:
    """M12 — enum-domain validation (``CustomTransformers.py:404-449``):
    values outside the scheming domain are clamped to the default."""
    arr = batch.column(col)
    ok = pc.is_in(arr, value_set=pa.array(list(allowed), type=pa.string()))
    return _set(batch, col, pc.if_else(pc.fill_null(ok, False), arr, default))


def word_match_clamp(
    batch: pa.Table, col: str, domain: Sequence[str], default: str, out: str
) -> pa.Table:
    """M13 — word-match domain repair
    (``CustomTransformers.py:677-713`` __fixDataSetPropertyUsingDomainWordMatch):
    the first domain value (in domain order) appearing as a whole word in
    ``col`` wins; no hit (or null) → default. Vectorized: one RE2
    word-boundary scan per domain value, folded right-to-left so earlier
    domain values take priority."""
    import re as _re

    arr = batch.column(col)
    result = pa.array([default] * batch.num_rows, pa.string())
    for w in reversed(list(domain)):
        hit = pc.match_substring_regex(arr, r"\b" + _re.escape(w) + r"\b")
        result = pc.if_else(pc.fill_null(hit, False), pa.scalar(w), result)
    return batch.append_column(out, result)


def conditional_set(
    batch: pa.Table, when_col: str, equals: object, then_col: str, then_value: object
) -> pa.Table:
    """M15 — conditional field fill (``CustomTransformers.py:639-656``
    fixResourceStatus): where ``when_col == equals`` and ``then_col`` is
    null, set ``then_value``."""
    cond = pc.and_(
        pc.fill_null(pc.equal(batch.column(when_col), equals), False),
        pc.is_null(batch.column(then_col)),
    )
    return _set(
        batch, then_col, pc.if_else(cond, then_value, batch.column(then_col))
    )


def constant_set(batch: pa.Table, col: str, value: object, dtype=None) -> pa.Table:
    """M21 — constant column assignment (``CustomTransformers.py:292-303``)."""
    n = batch.num_rows
    arr = pa.array([value] * n, type=dtype) if dtype else pa.array([value] * n)
    return _set(batch, col, arr)


def str_to_bool(batch: pa.Table, col: str) -> pa.Table:
    """M22 — 'true'/'false' strings → bool (``CustomTransformers.py:317-338``)."""
    low = pc.utf8_lower(batch.column(col))
    return _set(
        batch,
        col,
        pc.if_else(
            pc.is_null(low), pa.scalar(None, pa.bool_()), pc.equal(low, "true")
        ),
    )


def replace_substring(batch: pa.Table, col: str, pattern: str, replacement: str) -> pa.Table:
    """M17 — URL/hostname rewrite (``CustomTransformers.py:340-377``
    adjustURLDomain) as a vectorized literal replace."""
    return _set(
        batch, col, pc.replace_substring(batch.column(col), pattern, replacement)
    )


def strip_whitespace(batch: pa.Table, col: str) -> pa.Table:
    """M19 — whitespace strip (``CustomTransformers.py:480-497``)."""
    return _set(batch, col, pc.utf8_trim_whitespace(batch.column(col)))


def json_extract_field(batch: pa.Table, col: str, field_name: str, out: str) -> pa.Table:
    """M5/M16 analog — pull one field out of a stringified-JSON column
    (``CustomTransformers.py:715-765`` fixMoreInfo territory). The parse is a
    per-row op by nature; done via a pandas map (C-dispatched loop) — use
    inside an actor pool for hot paths."""
    s = batch.column(col).to_pandas()

    def get(v):
        if v is None:
            return None
        try:
            x = json.loads(v).get(field_name)
            return None if x is None else str(x)
        except (ValueError, AttributeError):
            return None

    return _set(batch, out, pa.array(s.map(get), pa.string()))


def _as_list_array(arr) -> pa.ListArray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _rebuild_list(
    arr: pa.ListArray, new_values: pa.Array, kept_parent: np.ndarray
) -> pa.ListArray:
    """Reassemble a list array from filtered flattened values using parent
    indices (robust to sliced offsets); null lists stay null."""
    n = len(arr)
    counts = np.bincount(kept_parent, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    validity = arr.is_valid().to_numpy(zero_copy_only=False)
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        new_values,
        mask=pa.array(~validity) if not validity.all() else None,
    )


def scrub_list_struct(
    batch: pa.Table, col: str, field: str, ignore_values: Sequence[object]
) -> pa.Table:
    """M2 — embedded-ignore scrub (``CKANData.py:265-305`` removeEmbeddedIgnores):
    drop elements of a ``list<struct>`` column whose ``field`` value is in the
    ignore set. Fully vectorized: flatten once, one ``is_in`` mask, offset
    rebuild from parent indices — no Python loop over elements."""
    arr = _as_list_array(batch.column(col))
    flat = pc.list_flatten(arr)
    parent = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
    vals = pc.struct_field(flat, field)
    drop = pc.fill_null(pc.is_in(vals, value_set=pa.array(list(ignore_values))), False)
    keep = pc.invert(drop).to_numpy(zero_copy_only=False)
    return _set(batch, col, _rebuild_list(arr, flat.filter(pa.array(keep)), parent[keep]))


def remap_list_struct(
    batch: pa.Table,
    col: str,
    field: str,
    mapping: Mapping[str, str],
    default: str | None = None,
) -> pa.Table:
    """J7 — per-element value remap inside a ``list<struct>`` column
    (``CustomTransformers.py:194-282`` remapUserNames, double-LUT lookup):
    the broadcast LUT is applied to the flattened field via dictionary
    encoding (O(distinct) Python work), the struct and list are rebuilt
    around it with the original offsets."""
    arr = _as_list_array(batch.column(col))
    flat = pc.list_flatten(arr)
    parent = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
    st = flat.type
    cols, names = [], []
    for i in range(st.num_fields):
        f = st.field(i)
        names.append(f.name)
        child = pc.struct_field(flat, f.name)
        if f.name == field:
            dict_arr = pc.dictionary_encode(child.combine_chunks() if isinstance(child, pa.ChunkedArray) else child)
            uniques = dict_arr.dictionary.to_pylist()
            remapped = pa.array(
                [
                    mapping.get(u, u if default is None else default)
                    if u is not None
                    else None
                    for u in uniques
                ],
                type=f.type,
            )
            child = remapped.take(dict_arr.indices)
        cols.append(child)
    new_flat = pa.StructArray.from_arrays(cols, names=names)
    return _set(batch, col, _rebuild_list(arr, new_flat, parent))


def fill_defaults_list_struct(
    batch: pa.Table, col: str, field: str, default: object
) -> pa.Table:
    """M3 DEEP variant — required-defaults fill INSIDE a ``list<struct>``
    column (the reference's DataPopulator walks defaults into lists of
    structs, ``/root/reference/bcdc2bcdc/CKANData.py:1789-1885``): null
    ``field`` values of every list element become ``default``. Vectorized:
    flatten once, one ``fill_null`` on the child, struct+list rebuilt around
    it with the original offsets."""
    arr = _as_list_array(batch.column(col))
    flat = pc.list_flatten(arr)
    parent = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
    st = flat.type
    cols, names = [], []
    for i in range(st.num_fields):
        f = st.field(i)
        names.append(f.name)
        child = pc.struct_field(flat, f.name)
        if f.name == field:
            child = pc.fill_null(child, default)
        if isinstance(child, pa.ChunkedArray):
            child = child.combine_chunks()
        cols.append(child)
    new_flat = pa.StructArray.from_arrays(cols, names=names)
    return _set(batch, col, _rebuild_list(arr, new_flat, parent))


def json_rename_key(batch: pa.Table, col: str, old: str, new: str) -> pa.Table:
    """M16 — the full more_info canonicalizer composition
    (``/root/reference/bcdc2bcdc/CustomTransformers.py:715-765`` fixMoreInfo):
    destringify the JSON column, RENAME ``old`` → ``new`` where present,
    re-stringify canonically (sorted keys, fixed separators). Per-row parse
    by nature (C-dispatched pandas map); run under an actor pool on hot
    paths."""
    s = batch.column(col).to_pandas()

    def fix(v):
        if v is None:
            return None
        try:
            d = json.loads(v)
        except ValueError:
            return v
        if isinstance(d, dict) and old in d:
            d[new] = d.pop(old)
        return json.dumps(d, sort_keys=True, separators=(",", ":"))

    return _set(batch, col, pa.array(s.map(fix), pa.string()))


def canonical_json(batch: pa.Table, col: str) -> pa.Table:
    """M16 — canonical re-serialization (sorted keys, fixed separators) of a
    stringified-JSON column (``CustomTransformers.py:739-764``)."""
    s = batch.column(col).to_pandas()

    def canon(v):
        if v is None:
            return None
        try:
            return json.dumps(json.loads(v), sort_keys=True, separators=(",", ":"))
        except ValueError:
            return v

    return _set(batch, col, pa.array(s.map(canon), pa.string()))
