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


def topk_partial(
    batch: pa.Table,
    group: str,
    order_col: str,
    tiebreak: str,
    k: int,
    asc: bool = False,
) -> pa.Table:
    """Keep at most k rows per group: lexsort by (group, ±order, tiebreak)
    and take the first k of each segment — vectorized, no per-key loop.
    ``asc=False`` (default) keeps the k LARGEST order values; ``asc=True``
    the k smallest (order_col must be signed when asc=False — the negation
    wraps on uint64)."""
    gk = batch.column(group).to_numpy(zero_copy_only=False)
    o = batch.column(order_col).to_numpy(zero_copy_only=False)
    tb = batch.column(tiebreak).to_numpy(zero_copy_only=False)
    order = np.lexsort((tb, o if asc else -o, gk))
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


def heavy_hitters(ds, group: str, key: str, k: int):
    """Per-group top-k most frequent keys (hot domains, hot users — the
    skew detector that feeds ``salt=``). Per-batch partial (group, key)
    counts collapse the shuffle to O(distinct keys); one bucketed groupby
    then sums partials and takes the top k per group (count desc, key asc
    — deterministic on tied counts). Output columns: group, key, ``n``."""
    from ..pipelines.queries import _bucketed_map_groups

    def partial(b: pa.Table) -> pa.Table:
        return _group_value_counts(b, group, key).rename_columns([group, key, "n"])

    def per_bucket(g: pa.Table) -> pa.Table:
        out = g.group_by([group, key]).aggregate([("n", "sum")])
        t = pa.table(
            {
                group: out.column(group),
                key: out.column(key),
                "n": out.column("n_sum"),
            }
        )
        return topk_partial(t, group, "n", key, k)

    part = ds.map_batches(partial, batch_format="pyarrow")
    return _bucketed_map_groups(part, [group], per_bucket)


def group_hash_sample(ds, group: str, id_col: str, k: int):
    """Deterministic stratified sample: the k rows per group with the
    SMALLEST splitmix64(id) — a fixed-size per-stratum sample that is
    reproducible across runs, cluster shapes, and data order (the
    per-group analog of :func:`hash_sample`). Same combiner shape as
    ``group_topk``: each batch forwards at most k rows per group. The
    ascending top-k never negates, so the raw uint64 hash sorts
    correctly as-is."""
    from ..pipelines.queries import _bucketed_map_groups

    def add_h(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column("__h", pa.array(splitmix64(ids)))

    part = ds.map_batches(
        lambda b: topk_partial(add_h(b), group, "__h", id_col, k, asc=True),
        batch_format="pyarrow",
    )
    return _bucketed_map_groups(
        part,
        [group],
        lambda g: topk_partial(g, group, "__h", id_col, k, asc=True).drop_columns(
            ["__h"]
        ),
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


# --- HyperLogLog distinct-count sketch (integer-exact estimator) -------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_HLL_WBITS = 64 - HLL_P  # 56 bits feed the leading-zero count
_HLL_RHO_MAX = _HLL_WBITS + 1  # rho(w=0) = 57
# alpha_m for m=256 as 2^-30 fixed point — the SAME integer constant feeds the
# numpy estimator and the generated SQL, so the sketch is bit-exact end to end
HLL_ALPHA_NUM = int(round(0.7213 / (1 + 1.079 / HLL_M) * (1 << 30)))
# estimate = alpha * m^2 / Z with Z kept scaled by 2^rho_max so every term is
# an integer; fold m^2 and both scale factors into one numerator (~2^103,
# fits int128 on the SQL side, arbitrary-precision Python int here)
_HLL_EST_NUM = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << _HLL_RHO_MAX)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length for uint64. No float round-trip — a
    float64 conversion misrounds near power-of-two boundaries above 2^53,
    which would corrupt rho for ~1/2000 hashes."""
    v = w.copy()
    bl = np.zeros(len(w), np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        bl[m] += np.uint64(s)
        v[m] >>= np.uint64(s)
    return bl + (v > 0)


def hll_partial(batch: pa.Table, group: str, key: str) -> pa.Table:
    """Per-batch HLL combiner: hash → (register idx, rho), max-reduce per
    (group, idx) INSIDE the batch so the shuffle moves at most
    groups×256 register rows per block, never raw keys. ``key`` must be a
    non-null integer column (hash strings upstream)."""
    h = splitmix64(batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64))
    idx = (h & np.uint64(HLL_M - 1)).astype(np.int64)
    rho = (_HLL_RHO_MAX - _bit_length_u64(h >> np.uint64(HLL_P))).astype(np.int64)
    t = pa.table({group: batch.column(group), "__idx": idx, "__rho": rho})
    out = t.group_by([group, "__idx"]).aggregate([("__rho", "max")])
    return pa.table(
        {
            group: out.column(group),
            "__idx": out.column("__idx"),
            "__rho": out.column("__rho_max"),
        }
    )


def hll_estimate_bucket(g: pa.Table, group: str) -> pa.Table:
    """Collapse register partials → one (group, approx_distinct) row per
    group in the bucket. Raw HLL estimator only, in exact integer math
    (empty registers contribute 2^rho_max to the scaled harmonic sum)."""
    gk = g.column(group).to_numpy(zero_copy_only=False)
    idx = g.column("__idx").to_numpy(zero_copy_only=False)
    rho = g.column("__rho").to_numpy(zero_copy_only=False)
    order = np.lexsort((idx, gk))
    gk, idx, rho = gk[order], idx[order], rho[order]
    change = np.empty(len(gk), bool)
    if len(gk):
        change[0] = True
        np.not_equal(gk[1:], gk[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(gk))
    out_groups, out_est = [], []
    for s, e in zip(starts, ends):
        regs = np.zeros(HLL_M, np.int64)
        np.maximum.at(regs, idx[s:e], rho[s:e])
        z = sum(1 << int(_HLL_RHO_MAX - r) for r in regs)  # exceeds int64; python int
        out_groups.append(gk[s])
        out_est.append(_HLL_EST_NUM // ((1 << 30) * z))
    return pa.table(
        {
            group: pa.array(out_groups, g.schema.field(group).type),
            "approx_distinct": pa.array(out_est, pa.int64()),
        }
    )


def hll_distinct(ds, group: str, key: str):
    """Approximate COUNT(DISTINCT key) per group, HLL with m=256 registers:
    per-batch register combiner → one bucketed shuffle of O(groups×256)
    register rows → integer-exact raw estimator. ~6.5% relative error once
    distinct(key) > ~2.5·m = 640 (below that the raw estimator overshoots;
    we deliberately skip the ln()-based linear-counting correction so the
    estimator stays bit-reproducible in integer math on both the numpy and
    SQL sides). The reference's analytics stop at exact counters
    (``/root/reference/bcdc2bcdc/CKANUpdate.py:214-233``); this is the
    cardinality primitive that replaces a full distinct shuffle at 100 TB."""
    from ..pipelines.queries import _bucketed_map_groups

    part = ds.map_batches(
        lambda b: hll_partial(b, group, key), batch_format="pyarrow"
    )
    return _bucketed_map_groups(part, [group], lambda g: hll_estimate_bucket(g, group))


def hll_distinct_sql(table: str, group: str, key: str) -> str:
    """DuckDB SQL computing ``hll_distinct`` bit-identically: same splitmix64,
    rho via a generated 56-term bit-length comparison sum (no float log),
    same 2^-30 fixed-point alpha and int128 integer division."""
    bl = " + ".join(f"CAST(w >= {1 << k} AS BIGINT)" for k in range(_HLL_WBITS))
    return f"""
    WITH h AS (SELECT {group} AS grp, {splitmix64_sql(key)} AS h FROM {table}),
    r AS (SELECT grp, CAST(h % {HLL_M} AS BIGINT) AS idx,
                 CAST(h // {HLL_M} AS UBIGINT) AS w FROM h),
    rr AS (SELECT grp, idx, {_HLL_RHO_MAX} - ({bl}) AS rho FROM r),
    mx AS (SELECT grp, idx, max(rho) AS mr FROM rr GROUP BY grp, idx),
    z AS (SELECT grp,
                 CAST({HLL_M} - count(*) AS HUGEINT)
                   * CAST({1 << _HLL_RHO_MAX} AS HUGEINT)
                 + sum(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - mr)) AS z
          FROM mx GROUP BY grp)
    SELECT grp AS {group},
           CAST(CAST('{_HLL_EST_NUM}' AS HUGEINT)
                // (CAST({1 << 30} AS HUGEINT) * z) AS BIGINT) AS approx_distinct
    FROM z
    """


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


def rate_threshold_u64(p: float) -> int:
    """Acceptance threshold for splitmix64(id) < t at rate ``p`` — ONE
    shared int so the numpy filter and the generated SQL use the same
    constant (float rounding happens exactly once, here)."""
    return min(max(int(p * float(1 << 64)), 0), (1 << 64) - 1)


def mixture_sample_batch(
    batch: pa.Table,
    group_col: str,
    id_col: str,
    rates: dict,
    default_rate: float = 0.0,
) -> pa.Table:
    """Deterministic per-source mixture sampling: keep a row iff
    splitmix64(id) < rate[group]·2^64 — the training-data mixture
    re-weighting step (sample web at 0.1, books at 0.9, …). Zero shuffle,
    reproducible across runs/cluster shapes/data order; groups absent from
    ``rates`` use ``default_rate``. Vectorized: one index_in per batch maps
    rows to their group's integer threshold."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(ids)
    keys = list(rates)
    thr = np.array(
        [rate_threshold_u64(rates[k]) for k in keys]
        + [rate_threshold_u64(default_rate)],
        np.uint64,
    )
    idx = pc.fill_null(
        pc.index_in(batch.column(group_col), pa.array(keys)), len(keys)
    ).to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(h < thr[idx]))


def mixture_sample(ds, group_col: str, id_col: str, rates: dict, default_rate: float = 0.0):
    return ds.map_batches(
        lambda b: mixture_sample_batch(b, group_col, id_col, rates, default_rate),
        batch_format="pyarrow",
    )


def rank_from_histogram(vals: np.ndarray, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sorted distinct values, SQL RANK() of each) from a value histogram:
    rank(v) = 1 + #rows with a smaller value. The histogram is the whole
    driver-side footprint — O(distinct values), the same contract as
    ``group_quantiles`` / the percentile length filter."""
    order = np.argsort(vals, kind="stable")
    vs, ns = vals[order], counts[order].astype(np.int64)
    ranks = np.ones(len(vs), np.int64)
    if len(vs) > 1:
        ranks[1:] += np.cumsum(ns[:-1])
    return vs, ranks


def rank_batch(batch: pa.Table, col: str, vals_sorted: np.ndarray, ranks: np.ndarray, out: str = "rnk") -> pa.Table:
    """Vectorized rank assignment: one searchsorted per batch against the
    broadcast (value → rank) table."""
    v = batch.column(col).to_numpy(zero_copy_only=False)
    idx = np.searchsorted(vals_sorted, v)
    return batch.append_column(out, pa.array(ranks[idx], pa.int64()))


def split_assign_batch(
    batch: pa.Table,
    id_col: str,
    fractions: dict,
    out: str = "split",
    salt: int = 0,
) -> pa.Table:
    """Deterministic dataset split (train/val/test): the id's splitmix64
    hash falls into consecutive u64 ranges sized by ``fractions`` (ordered
    as given; any remainder joins the LAST split). One hash + one
    searchsorted per batch — no shuffle, no RNG state, reproducible across
    runs and cluster shapes, and a row NEVER changes split when the
    corpus grows (the property period-based splits lack). ``salt`` derives
    independent splits from the same ids."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(ids ^ np.uint64(salt * 0x9E3779B97F4A7C15 % (1 << 64)))
    names = list(fractions)
    edges, acc = [], 0.0
    for name in names[:-1]:
        acc += fractions[name]
        edges.append(rate_threshold_u64(acc))
    idx = np.searchsorted(np.array(edges, np.uint64), h, side="right")
    lab = pa.array(np.array(names, dtype=object)[idx], pa.string())
    return batch.append_column(out, lab)


def split_assign(ds, id_col: str, fractions: dict, salt: int = 0):
    return ds.map_batches(
        lambda b: split_assign_batch(b, id_col, fractions, salt=salt),
        batch_format="pyarrow",
    )


def histogram_quantiles(ds, col: str, qs: list, bins: int = 4096):
    """Approximate quantiles for a CONTINUOUS column via a two-pass
    fixed-width histogram — the scale path where the exact distinct-value
    histogram (``group_quantiles``) degenerates (continuous doubles →
    O(rows) distinct values). Pass 1: global min/max (per-batch partials,
    driver folds a handful of rows). Pass 2: per-batch ``np.bincount``
    over uniform bin ids — the driver folds ``bins``-sized partial count
    vectors; NOTHING shuffles. The estimate for quantile q is the LOWER
    EDGE of the first bin whose cumulative count reaches q·N: error ≤ one
    bin width, deterministic, and the quantization arithmetic
    (``floor((v-min)·bins/(max-min))``, clamped) is the same IEEE-double
    expression the SQL oracle evaluates, so results are bit-comparable.

    Returns a pa.Table (q, estimate) — one row per requested quantile."""
    import pyarrow.compute as _pc

    def mm(b: pa.Table) -> pa.Table:
        v = b.column(col)
        return pa.table(
            {"lo": [_pc.min(v).as_py()], "hi": [_pc.max(v).as_py()]}
        )

    from ..pipelines.queries import _collect

    mm_tbl = _collect(ds.map_batches(mm, batch_format="pyarrow"))
    lo = _pc.min(mm_tbl.column("lo")).as_py()
    hi = _pc.max(mm_tbl.column("hi")).as_py()
    if lo is None or hi is None or hi == lo:
        est = [lo] * len(qs)
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "estimate": pa.array(est, pa.float64())})

    def hist(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.floor((v - lo) * bins / (hi - lo)).astype(np.int64)
        np.clip(idx, 0, bins - 1, out=idx)
        counts = np.bincount(idx, minlength=bins)
        return pa.table(
            {
                "bin": pa.array(np.arange(bins, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    parts = _collect(ds.map_batches(hist, batch_format="pyarrow"))
    agg = parts.group_by(["bin"]).aggregate([("n", "sum")]).sort_by("bin")
    counts = np.zeros(bins, np.int64)
    counts[agg.column("bin").to_numpy(zero_copy_only=False)] = agg.column(
        "n_sum"
    ).to_numpy(zero_copy_only=False)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    est = []
    for q in qs:
        target = int(np.ceil(q * total)) or 1
        b = int(np.searchsorted(cum, target))
        est.append(lo + b * (hi - lo) / bins)
    return pa.table(
        {"q": pa.array([float(x) for x in qs], pa.float64()),
         "estimate": pa.array(est, pa.float64())}
    )
