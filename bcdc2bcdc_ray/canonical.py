"""Canonicalization + content-hash kernel.

Replaces the reference's record-pair deep diff
(``/root/reference/bcdc2bcdc/Diff.py:48-53`` ``deepdiff.DeepDiff`` +
``/root/reference/bcdc2bcdc/CKANData.py:599-747`` per-record compare) with a
vectorized content hash: canonicalize the compare columns, hash each row to a
uint64, and detect changes with a single ``pc.not_equal`` over hash columns
(SURVEY §2.2 M6/M7, §2.7 D4).  At 10^10 rows a per-record Python diff is
impossible; a per-column SipHash is one C pass.

Everything here is a pure function on ``pyarrow.Table`` / arrays — unit
testable without Ray, used inside ``map_batches(batch_format="pyarrow")``.

Canonicalization rules (applied identically in the engine AND the test
oracle — SURVEY §7 hard part (d)):
- falsy string forms ``''`` and ``'None'`` → null on configured columns
  (both-falsy-equal ``Diff.py:55-67``; fixNoneAsString
  ``CustomTransformers.py:153-170``);
- missing columns → null-padded columns of the spec's type (the reference's
  missing-field→None schema padding, ``CKANData.py:255-258``);
- hash is computed over the padded, evolved schema in a fixed column order.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

HASH_COL = "__content_hash"

# Name+version of the self-owned hash function. Written into every lake's
# _meta.json: the lake's PHYSICAL partition layout is a function of this
# hash, so a lake can only be merged in place by an engine using the same
# version (replay refuses on mismatch rather than silently mis-routing).
# v2 = poly64/splitmix64 below; v1 was pandas SipHash (dropped: it tied the
# on-disk layout to a third-party library's hash stability across upgrades).
HASH_VERSION = "poly64-v2"

_NULL_SENTINEL = np.uint64(0x9E3779B97F4A7C15)  # fixed odd constant for null rows
_MIX = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime_2, used as column mixer

# ---------------------------------------------------------------------------
# Self-owned vectorized value hashing (no pandas/third-party hash in the
# on-disk layout path). Strings: polynomial rolling hash mod 2^64 with the
# odd FNV-64 prime as base — odd ⇒ invertible mod 2^64, which is what makes
# the O(n) vectorized prefix construction below possible — finalized with a
# splitmix64-style mixer. Numerics: bit-pattern + splitmix64.
# ---------------------------------------------------------------------------

_POLY_B = np.uint64(0x100000001B3)  # FNV-64 prime, odd
_POLY_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_POLY_CHUNK = 1 << 20  # ~1M bytes/chunk: 8 MB uint64 temps (cache-friendly)
# and the position-only pow tables stay 1M entries (built once per process)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mixer)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


_POW_CACHE: dict = {}


def _pow_tables(n: int, base: np.uint64 = _POLY_B) -> tuple[np.ndarray, np.ndarray]:
    """Cached position-only tables per base: powB[k] = B^k, binv_pow[k] = B^-k
    (mod 2^64), grown geometrically and sliced per call."""
    slot = _POW_CACHE.get(int(base))
    cap = slot["cap"] if slot else 0
    if n + 1 > cap:
        cap = max(n + 1, 2 * cap, 1 << 16)
        base_inv = np.uint64(pow(int(base), -1, 1 << 64))  # base must be odd
        with np.errstate(over="ignore"):
            powB = np.empty(cap, np.uint64)
            powB[0] = np.uint64(1)
            np.multiply.accumulate(np.full(cap - 1, base, np.uint64), out=powB[1:])
            binv = np.empty(cap, np.uint64)
            binv[0] = np.uint64(1)
            np.multiply.accumulate(
                np.full(cap - 1, base_inv, np.uint64), out=binv[1:]
            )
        _POW_CACHE[int(base)] = {"cap": cap, "powB": powB, "binv": binv}
    slot = _POW_CACHE[int(base)]
    return slot["powB"], slot["binv"]


def prefix_poly(
    data: np.ndarray, base: np.uint64 = _POLY_B
) -> tuple[np.ndarray, np.ndarray]:
    """Prefix polynomial hashes of a uint8 buffer, all mod 2^64.

    Returns (H, powB) with ``H[k]`` = poly of the first k bytes
    (H[k] = H[k-1]*B + data[k-1]) and ``powB[k]`` = B^k. The recurrence is
    computed WITHOUT a Python loop: since B is odd (invertible mod 2^64),
    H[k] = B^(k-1) * cumsum(data[t] * B^-t). Any segment's poly then falls
    out of two gathers: poly[i:j) = H[j] - H[i] * powB[j-i].
    """
    n = len(data)
    powB, binv_pow = _pow_tables(n, base)
    with np.errstate(over="ignore"):
        C = np.empty(n + 1, np.uint64)
        C[0] = np.uint64(0)
        np.cumsum(data.astype(np.uint64) * binv_pow[:n], out=C[1:])
        H = np.empty(n + 1, np.uint64)
        H[0] = np.uint64(0)
        H[1:] = powB[:n] * C[1:]
    return H, powB


def poly_hash_segments(
    data: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    base: np.uint64 = _POLY_B,
) -> np.ndarray:
    """Polynomial hash of each byte segment ``data[starts[i]:ends[i])`` —
    vectorized via prefix hashes, processed in bounded-memory chunks aligned
    to segment boundaries (a 128 MB string block never materializes >~130 MB
    of temporaries)."""
    out = np.empty(len(starts), np.uint64)
    if len(starts) == 0:
        return out
    i = 0
    n_seg = len(starts)
    while i < n_seg:
        chunk_base = starts[i]
        # offsets are monotonic → largest j with ends[j-1] <= chunk start + CHUNK
        j = int(np.searchsorted(ends, chunk_base + _POLY_CHUNK, side="right"))
        j = max(j, i + 1)
        lo, hi = int(starts[i]), int(ends[j - 1])
        H, powB = prefix_poly(data[lo:hi], base)
        s = (starts[i:j] - lo).astype(np.int64)
        e = (ends[i:j] - lo).astype(np.int64)
        with np.errstate(over="ignore"):
            out[i:j] = H[e] - H[s] * powB[e - s]
        i = j
    return out


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data_uint8, starts, ends) views of a (large_)string array's buffers.

    Raises on the corrupt compacted-slice layout some pyarrow-16 kernels
    emit for sliced inputs (offsets overrun the data buffer; there is no
    reliable recovery — the producer must compact its input first, as
    ``falsy_to_null`` does). Loud beats silently-wrong hashes."""
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype, count=arr.offset + len(arr) + 1)[
        arr.offset :
    ]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    )
    starts, ends = offs[:-1], offs[1:]
    if len(starts) and ends[-1] > len(data):
        raise ValueError(
            "malformed string array: offsets overrun the data buffer "
            "(a sliced-kernel artifact — compact the input before the kernel)"
        )
    return data, starts, ends


def hash_string_array(arr: pa.Array) -> np.ndarray:
    """uint64 hash per string value (nulls hashed as empty; caller applies
    the null sentinel). Length is mixed in so '' and '\\0' differ.

    Short-string columns (avg ≤ 24 bytes — keys, enums, ids) are typically
    repeat-heavy: dictionary-encode first, hash only the distinct values,
    gather. Measured 4-5× on Zipf conv_id keys; long free-text columns skip
    the encode (mostly unique — the encode would be pure overhead)."""
    n = len(arr)
    if n > 1024:
        data_len = (
            arr.buffers()[2].size if arr.buffers()[2] is not None else 0
        )
        if data_len / n <= 24:
            denc = pc.dictionary_encode(arr)
            dict_vals = denc.dictionary
            if len(dict_vals) == 0:
                # ALL-null array: empty dictionary, every index null — the
                # gather below would index into an empty hash array. Hash
                # straight to the null sentinel (what the caller's sentinel
                # pass would produce anyway). Reachable from any >1024-row
                # batch whose string key column is entirely null (e.g. the
                # null group of a secondary index / view partition).
                return np.full(n, _NULL_SENTINEL, np.uint64)
            if len(dict_vals) < n // 2:  # real repeats — worth the encode
                uh = hash_string_array(dict_vals)
                idx = pc.fill_null(denc.indices, 0).to_numpy(zero_copy_only=False)
                out = uh[idx]
                if denc.null_count:  # caller also sentinels, but be exact here
                    nulls = pc.is_null(denc).to_numpy(zero_copy_only=False)
                    out[nulls] = _NULL_SENTINEL
                return out
    data, starts, ends = _string_buffers(arr)
    h = poly_hash_segments(data, starts, ends)
    return splitmix64(h ^ splitmix64((ends - starts).astype(np.uint64)))


def _hash_one_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 per value — self-owned (stable across processes,
    machines AND library upgrades; the lake's partition layout depends on it)."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            arr = col.chunk(0)
        elif col.num_chunks == 0:
            return np.empty(0, np.uint64)
        else:
            # hash per chunk and concatenate — avoids combine_chunks, which
            # rejects the compacted-slice layout some kernels emit
            return np.concatenate([_hash_one_column(c) for c in col.chunks])
    else:
        arr = col
    t = arr.type
    if pa.types.is_dictionary(t):
        arr = arr.dictionary_decode()
        t = arr.type
    nulls: np.ndarray | None = None
    if arr.null_count:
        nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        h = hash_string_array(arr)
    elif pa.types.is_floating(t):
        x = arr.cast(pa.float64()).to_numpy(zero_copy_only=False).copy()
        nan = np.isnan(x)
        if nan.any():
            nulls = nan if nulls is None else (nulls | nan)
            x[nan] = 0.0
        x[x == 0.0] = 0.0  # -0.0 → +0.0 (canonical equality)
        h = splitmix64(x.view(np.uint64))
    elif pa.types.is_boolean(t):
        h = splitmix64(
            arr.cast(pa.uint8()).to_numpy(zero_copy_only=False).astype(np.uint64)
        )
    elif (
        pa.types.is_integer(t)
        or pa.types.is_temporal(t)
    ):
        # fill nulls BEFORE to_numpy: a null-bearing int/temporal array
        # otherwise converts to float64 (NaN-nulls) and the uint64 bit
        # reinterpret below would hash float bit patterns — i.e. the SAME
        # value would hash differently depending on whether its batch
        # happened to contain a null elsewhere. Null positions get the
        # sentinel afterwards, so the fill value never surfaces.
        if pa.types.is_unsigned_integer(t):
            xi = pc.fill_null(pc.cast(arr, pa.uint64()), 0)
            x = xi.to_numpy(zero_copy_only=False)
        else:
            xi = pc.fill_null(pc.cast(arr, pa.int64(), safe=False), 0)
            x = xi.to_numpy(zero_copy_only=False).view(np.uint64)
        h = splitmix64(x)
    else:
        # exotic types (decimal, binary, nested): canonical string form
        h = hash_string_array(pc.cast(arr, pa.string()))
    if nulls is not None and nulls.any():
        h = h.copy()
        h[nulls] = _NULL_SENTINEL
    return h


def falsy_to_null(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Map '' and literal 'None' to null on a string array (M6 + M10).

    Sliced inputs are compacted first: pyarrow 16's ``if_else`` emits a
    corrupt string array (compacted data buffer, un-rebased offsets — even
    ``as_py`` reads garbage) for some sliced inputs, and Ray map batches are
    routinely zero-copy block slices."""
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        return arr
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset != 0:
        arr = pa.concat_arrays([arr])
    mask = pc.or_kleene(pc.equal(arr, ""), pc.equal(arr, "None"))
    mask = pc.fill_null(mask, False)
    return pc.if_else(mask, pa.scalar(None, type=arr.type), arr)


def canonicalize(batch: pa.Table, falsy_null_columns: Sequence[str]) -> pa.Table:
    """Apply falsy→null canonicalization to the configured string columns."""
    for name in falsy_null_columns:
        if name in batch.column_names:
            i = batch.column_names.index(name)
            batch = batch.set_column(i, name, falsy_to_null(batch.column(i)))
    return batch


def pad_missing_columns(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Add null columns for any schema field absent from the batch.

    The reference pads missing user fields with None before comparing
    (``CKANData.py:255-258``); at merge time this is the column-add half of
    schema evolution.
    """
    n = batch.num_rows
    for fld in schema:
        if fld.name not in batch.column_names:
            batch = batch.append_column(fld.name, pa.nulls(n, type=fld.type))
    return batch


def content_hash(
    batch: pa.Table,
    columns: Sequence[str],
    falsy_null_columns: Sequence[str] = (),
) -> np.ndarray:
    """Row-wise uint64 content hash over ``columns`` in the given fixed order.

    Column hashes are combined with a multiply-rotate mixer so that
    (a, b) != (b, a) and single-column changes flip the row hash.
    """
    canon = canonicalize(batch, falsy_null_columns)
    out = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for name in columns:
            h = _hash_one_column(canon.column(name))
            out = (out * _MIX) ^ h
            out = (out << np.uint64(13)) | (out >> np.uint64(51))
    return out


def add_content_hash(
    batch: pa.Table,
    columns: Sequence[str],
    falsy_null_columns: Sequence[str] = (),
    out_col: str = HASH_COL,
) -> pa.Table:
    h = content_hash(batch, columns, falsy_null_columns)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(h, type=pa.uint64()))


def key_hash(batch: pa.Table, key_columns: Sequence[str]) -> np.ndarray:
    """Deterministic uint64 hash of the merge key — used for partition
    assignment (hash(conv_id) % P) and bucketed joins. Must be stable across
    processes so the lake's partition layout survives restarts."""
    return content_hash(batch, key_columns)


def partition_ids(
    batch: pa.Table, key_columns: Sequence[str], num_partitions: int
) -> np.ndarray:
    return (key_hash(batch, key_columns) % np.uint64(num_partitions)).astype(np.int64)


def partition_fingerprint(
    tbl: pa.Table, key_columns: Sequence[str], hash_col: str = HASH_COL
) -> int:
    """Order-independent uint64 fingerprint of a partition's key→content
    mapping: XOR over rows of splitmix64(key_hash ^ stored content hash).
    Together with the row count, equality means identical partition STATE
    under the engine's content-hash equality model (the same 64-bit trust
    NOOP suppression and diff classification rest on) — which is what lets
    ``diff_lakes`` skip an unchanged co-partition without reading either
    file (cost ∝ changed partitions, the dominant win of an incremental
    100-TB sync). The splitmix64 mix prevents the XOR from cancelling
    structured hash pairs; per-key hashes make key-set differences with
    coincidentally equal payload multisets visible."""
    if tbl.num_rows == 0:
        return 0
    kh = key_hash(tbl, key_columns)
    ch = tbl.column(hash_col)
    if isinstance(ch, pa.ChunkedArray):
        ch = ch.combine_chunks()
    chn = ch.to_numpy(zero_copy_only=False).astype(np.uint64)
    return int(np.bitwise_xor.reduce(splitmix64(kh ^ chn)))
