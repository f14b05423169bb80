"""Distributed order statistics + deterministic sampling.

None of these exist in the reference (its analytics stop at counters —
``/root/reference/bcdc2bcdc/CKANUpdate.py:214-233``, SURVEY §2.7); they are
the order-statistic / sampling primitives a large-scale training-data
pipeline needs, built scale-first:

- ``group_quantiles``: EXACT per-group quantiles via a distributed value
  histogram — per-batch partial (group, value) counts collapse the shuffle
  to O(distinct values), then one small bucketed groupby walks each
  group's cumulative histogram. Unlike a sort-based quantile this never
  moves raw rows and is exact at any scale while ``distinct(value)`` per
  group stays bounded (ints, cents, scores, lengths — the common cases).
  Matches DuckDB ``quantile_disc`` (index ceil(q*n)-1).
- ``group_topk``: per-group top-k with a per-batch partial top-k combiner:
  each batch forwards at most k rows per group it contains, so the shuffle
  moves O(k * groups * blocks) rows, never the dataset.
- ``hash_sample``: deterministic Bernoulli sampling by splitmix64(id) —
  reproducible across runs/cluster sizes, no RNG state, no coordination;
  the exact mixer is re-expressed in SQL for the oracle
  (``splitmix64_sql``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..canonical import splitmix64


def _group_value_counts(batch: pa.Table, group: str, value: str) -> pa.Table:
    out = (
        batch.select([group, value])
        .group_by([group, value])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            group: out.column(group),
            value: out.column(value),
            "__n": out.column("count_all"),
        }
    )


def quantiles_from_hist(
    g: pa.Table, group: str, value: str, qs: list[float], out_names: list[str]
) -> pa.Table:
    """Collapse (group, value, __n) histogram rows → one row per group with
    quantile_disc values (index ceil(q*n)-1, DuckDB semantics). Vectorized
    across values; one tiny loop per GROUP (segment), not per row."""
    gk = g.column(group).to_numpy(zero_copy_only=False)
    v = g.column(value).to_numpy(zero_copy_only=False)
    n = g.column("__n").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, gk))
    gk, v, n = gk[order], v[order], n[order]
    change = np.empty(len(gk), bool)
    if len(gk):
        change[0] = True
        np.not_equal(gk[1:], gk[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(gk))
    out_groups = []
    out_q: list[list] = [[] for _ in qs]
    for s, e in zip(starts, ends):
        cum = np.cumsum(n[s:e])
        total = cum[-1]
        out_groups.append(gk[s])
        for qi, q in enumerate(qs):
            target = int(np.ceil(q * total))  # 1-based rank, ceil(q*n)
            idx = int(np.searchsorted(cum, max(target, 1), side="left"))
            out_q[qi].append(v[s + idx])
    cols = {group: pa.array(out_groups, g.schema.field(group).type)}
    vt = g.schema.field(value).type
    for name, valsq in zip(out_names, out_q):
        cols[name] = pa.array(valsq, vt)
    return pa.table(cols)


def group_quantiles(ds, group: str, value: str, qs: list[float], out_names: list[str]):
    """ds must already carry an int-typed ``value`` column (convert money to
    cents upstream — the repo's float-determinism policy)."""
    from ..pipelines.queries import _bucketed_map_groups

    partial = ds.map_batches(
        lambda b: _group_value_counts(b, group, value), batch_format="pyarrow"
    )
    return _bucketed_map_groups(
        partial,
        [group],
        lambda g: quantiles_from_hist(g, group, value, qs, out_names),
    )


def topk_partial(batch: pa.Table, group: str, order_col: str, tiebreak: str, k: int) -> pa.Table:
    """Keep at most k rows per group: lexsort by (group, -order, tiebreak)
    and take the first k of each segment — vectorized, no per-key loop."""
    gk = batch.column(group).to_numpy(zero_copy_only=False)
    o = batch.column(order_col).to_numpy(zero_copy_only=False)
    tb = batch.column(tiebreak).to_numpy(zero_copy_only=False)
    order = np.lexsort((tb, -o, gk))
    gs = gk[order]
    change = np.empty(len(gs), bool)
    if len(gs):
        change[0] = True
        np.not_equal(gs[1:], gs[:-1], out=change[1:])
    seg_id = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    rank_in_seg = np.arange(len(gs)) - starts[seg_id]
    keep = order[rank_in_seg < k]
    return batch.take(pa.array(np.sort(keep)))


def group_topk(ds, group: str, order_col: str, tiebreak: str, k: int):
    """Deterministic per-group top-k (order desc, tiebreak asc): partial
    top-k per batch (combiner) → one bucketed groupby → final top-k."""
    from ..pipelines.queries import _bucketed_map_groups

    part = ds.map_batches(
        lambda b: topk_partial(b, group, order_col, tiebreak, k),
        batch_format="pyarrow",
    )
    return _bucketed_map_groups(
        part, [group], lambda g: topk_partial(g, group, order_col, tiebreak, k)
    )


def hash_sample_batch(batch: pa.Table, id_col: str, p: float) -> pa.Table:
    """Keep rows where splitmix64(id) < p * 2^64 — deterministic Bernoulli
    sample, stable across runs and cluster shapes."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    threshold = np.uint64(int(p * float(1 << 64)))
    return batch.filter(pa.array(splitmix64(ids) < threshold))


def hash_sample(ds, id_col: str, p: float):
    return ds.map_batches(
        lambda b: hash_sample_batch(b, id_col, p), batch_format="pyarrow"
    )


# --- SQL re-expression of splitmix64 for the DuckDB oracle -------------------


def _sql_mul_mod64(x: str, c: int) -> str:
    """``(x * c) mod 2^64`` for UBIGINT ``x`` without 128-bit overflow:
    split the constant into 32-bit halves, products stay < 2^96 (HUGEINT)."""
    cl, ch = c & 0xFFFFFFFF, c >> 32
    m64 = 1 << 64
    return (
        f"CAST(((CAST({x} AS HUGEINT) * {cl}) % {m64} + "
        f"(((CAST({x} AS HUGEINT) % 4294967296) * {ch}) % 4294967296) * 4294967296"
        f") % {m64} AS UBIGINT)"
    )


def _sql_xorshift(x: str, n: int) -> str:
    return f"xor({x}, ({x}) >> {n})"


def splitmix64_sql(col: str) -> str:
    """DuckDB expression computing splitmix64(col) bit-identically to
    ``canonical.splitmix64`` (UBIGINT xor/shift, HUGEINT mul-mod-2^64)."""
    x = f"CAST({col} AS UBIGINT)"
    x = _sql_xorshift(x, 30)
    x = _sql_mul_mod64(x, 0xBF58476D1CE4E5B9)
    x = _sql_xorshift(x, 27)
    x = _sql_mul_mod64(x, 0x94D049BB133111EB)
    x = _sql_xorshift(x, 31)
    return x
