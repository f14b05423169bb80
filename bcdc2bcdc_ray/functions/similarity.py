"""Approximate-nearest-neighbor search over an embedding column.

Not present in the reference (its closest analog is the word-match domain
repair, ``/root/reference/bcdc2bcdc/CustomTransformers.py:677-713``) — this is
the similarity-search component a training-data engine needs.

Two paths:
- ``BruteForceTopK`` — baseline: per-batch numpy matmul of the batch's
  embedding matrix against a BROADCAST query matrix (``ray.put`` once on the
  driver, ``ray.get`` once per actor in ``__init__`` — never re-shipped per
  batch), emitting per-batch local top-k partials; a tiny driver-side merge
  (or ``sort().limit(k)``) finalizes. Scales linearly: every batch is one
  BLAS call, the shuffle carries only k rows per batch.
- ``lsh_bucket_ids`` — scale path: random-hyperplane (SimHash) bucketing;
  search touches only the query's bucket (and optionally its Hamming-1
  neighbors), turning O(N) scans into O(N / 2^bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy where possible."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


class BruteForceTopK:
    """map_batches callable class: local top-k cosine similarities of each
    batch against the query matrix.

    ``query_ref`` may be a ``ray.ObjectRef`` (broadcast: resolved ONCE here
    in ``__init__``, the actor-pool pattern) or a plain ndarray for tests.
    """

    def __init__(self, query_ref, k: int = 10, id_col: str = "vec_id"):
        import ray

        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        q = np.asarray(q, dtype=np.float64)
        if q.ndim == 1:
            q = q[None, :]
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.q_unit = q / qn
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ self.q_unit.T  # (n, n_queries)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        out_ids, out_q, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            if k == 0:
                continue
            # tie-break by id ASC at the k-boundary (lexsort, not bare
            # argpartition) so the combiner keeps the same row the oracle's
            # ORDER BY sim DESC, id would — ties across duplicate vectors
            # must survive to the finalize stage deterministically
            top = np.lexsort((ids, -s))[:k]
            out_ids.append(ids[top])
            out_q.append(np.full(k, qi, dtype=np.int32))
            out_sim.append(s[top])
        if not out_ids:
            return pa.table(
                {
                    self.id_col: pa.array([], pa.int64()),
                    "query_idx": pa.array([], pa.int32()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                self.id_col: pa.array(np.concatenate(out_ids)),
                "query_idx": pa.array(np.concatenate(out_q), pa.int32()),
                "cos_sim": pa.array(np.concatenate(out_sim), pa.float64()),
            }
        )


_WORKER_CACHE: dict = {}


def _cached(cls, *args):
    """Per-worker-process instance cache — build-once state under plain
    map_batches tasks (see pipelines/queries.py:_cached; duplicated here to
    keep the functions package standalone). Bounded to one entry per class:
    a new broadcast evicts the previous run's pinned copy."""
    key = tuple(a.hex() if hasattr(a, "hex") else a for a in args)
    slot = _WORKER_CACHE.get(cls.__qualname__)
    if slot is None or slot[0] != key:
        slot = (key, cls(*args))
        _WORKER_CACHE[cls.__qualname__] = slot
    return slot[1]


def topk_cosine(ds, query, k: int = 10, id_col: str = "vec_id"):
    """Full ANN pipeline: broadcast query → per-batch local top-k →
    global top-k via sort+limit over the tiny partial set."""
    import ray

    ref = ray.put(np.asarray(query, dtype=np.float64))
    partials = ds.map_batches(
        lambda b: _cached(BruteForceTopK, ref, k, id_col)(b),
        batch_format="pyarrow",
    )
    # deterministic tie-break on id so the top-k set is stable
    return partials.sort(["cos_sim", id_col], descending=[True, False]).limit(k)


class HyperplaneLSH:
    """Random-hyperplane bucketing: ``bucket = sign bits of (E @ H)`` —
    deterministic (fixed seed), so the same vector always lands in the same
    bucket on every worker. Bucket co-location then happens with one
    ``groupby('bucket')``."""

    def __init__(self, dim: int, bits: int = 8, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        proj = mat @ self.h
        bits = (proj > 0).astype(np.uint32)
        bucket = np.zeros(len(mat), dtype=np.int64)
        for b in range(bits.shape[1]):
            bucket = (bucket << 1) | bits[:, b]
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def bucket_of(self, vec: np.ndarray) -> int:
        """Bucket id of a single query vector (same hyperplanes)."""
        bits = (np.asarray(vec, dtype=np.float64) @ self.h > 0).astype(np.int64)
        out = 0
        for b in bits:
            out = (out << 1) | int(b)
        return out

    def probe_buckets(self, vec: np.ndarray, probes: int) -> list[int]:
        """Multiprobe sequence (Lv et al. '07): the query's bucket plus the
        buckets reached by flipping the LOWEST-|margin| hyperplane bits —
        near-misses across a hyperplane the query barely cleared are the
        likeliest home of missed neighbors. Returns ≤ ``probes`` bucket ids
        ordered by increasing flipped-margin cost."""
        from itertools import combinations

        proj = np.asarray(vec, dtype=np.float64) @ self.h  # (bits,)
        nbits = proj.shape[0]
        base = self.bucket_of(vec)
        margins = np.abs(proj)
        # enumerate flip subsets of the smallest-margin bits, cheapest first
        cand: list[tuple[float, tuple[int, ...]]] = []
        small = np.argsort(margins)[: min(nbits, 12)]
        for r in range(1, len(small) + 1):
            for comb in combinations(small, r):
                cand.append((float(margins[list(comb)].sum()), comb))
            if len(cand) >= 4 * probes:
                break
        cand.sort()
        out = [base]
        for _, comb in cand[: max(0, probes - 1)]:
            b = base
            for bit in comb:
                # bit index counts from the most-significant position
                b ^= 1 << (nbits - 1 - int(bit))
            out.append(b)
        return out


class BandedHyperplaneLSH:
    """OR-amplified hyperplane bucketing (the cosine analog of MinHash
    banding): ``bands`` independent hyperplane sets; a pair is a candidate
    if it shares a bucket in ANY band — recall 1-(1-p)^bands at bands× the
    per-band bucket work. Emits ONLY (id, band, bucket) rows — the heavy
    embedding payload never enters the shuffle; candidates gather their
    vectors afterwards."""

    def __init__(self, dim: int, bits: int = 2, bands: int = 8, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((bands, dim, bits))
        self.bits = bits
        self.bands = bands

    def __call__(self, batch: pa.Table, id_col: str = "vec_id") -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        n = len(mat)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        weights = 1 << np.arange(self.bits)
        out_ids = np.repeat(ids, self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        buckets = np.empty((n, self.bands), dtype=np.int64)
        for k in range(self.bands):
            buckets[:, k] = ((mat @ self.h[k]) > 0) @ weights
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(buckets.reshape(-1), pa.int64()),
            }
        )


def topk_cosine_lsh(
    ds,
    query,
    dim: int,
    bits: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    seed: int = 7,
    probes: int = 1,
):
    """IVF/LSH-bucketed ANN (the scale path): bucket every vector with the
    deterministic hyperplane hash, scan only the query's ``probes`` most
    promising buckets (multiprobe: the query's own bucket + lowest-margin
    bit flips), then brute-force top-k over that ~probes·N/2^bits slice.
    ``probes`` trades scan fraction for recall — the pytest recall gate
    pins ≥ 0.9 vs the exact scan on the fixture at the default used by the
    ann_topk_lsh query."""
    import pyarrow.compute as pc

    lsh = HyperplaneLSH(dim, bits, seed)
    probe = pa.array(lsh.probe_buckets(query, probes), pa.int64())
    bucketed = ds.map_batches(
        lambda b: _cached(HyperplaneLSH, dim, bits, seed)(b),
        batch_format="pyarrow",
    )
    in_bucket = bucketed.map_batches(
        lambda b: b.filter(
            pc.fill_null(pc.is_in(b.column("bucket"), value_set=probe), False)
        ),
        batch_format="pyarrow",
    )
    return topk_cosine(in_bucket, query, k=k, id_col=id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    mat: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Deterministic Lloyd k-means on unit-normalized vectors (cosine
    metric: assign by max dot product, centroid = renormalized mean).
    Pure numpy, meant for a bounded driver-side SAMPLE — never the full
    dataset. Empty clusters re-seed to the worst-assigned point."""
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    rng = np.random.default_rng(seed)
    n = len(unit)
    k = min(n_centroids, n)
    cent = unit[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        sims = unit @ cent.T  # (n, k)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        new = np.zeros_like(cent)
        np.add.at(new, assign, unit)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            # re-seed dead centroids to the points the quantizer serves worst
            worst = np.argsort(best)[: int(empty.sum())]
            new[empty] = unit[worst]
            counts[empty] = 1
        cn = np.linalg.norm(new, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        cent = new / cn
    return cent


class IVFAssign:
    """map_batches callable: append ``ivf_list`` — the nearest-centroid id
    of each embedding (one BLAS matmul per batch against the broadcast
    centroid matrix, resolved once per worker)."""

    def __init__(self, centroids_ref):
        import ray

        c = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )
        self.cent = np.asarray(c, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        assign = np.argmax((mat / norms) @ self.cent.T, axis=1)
        return batch.append_column("ivf_list", pa.array(assign.astype(np.int32)))


def _ivf_sample(ds, id_col: str, p: float) -> np.ndarray:
    """Deterministic bounded training sample: splitmix64(id) < p·2^64.
    Driver materializes ONLY this slice (choose p so the sample stays ~1e5
    rows at the target scale)."""
    from ..canonical import splitmix64

    thr = np.uint64(int(p * float(1 << 64)))

    def pick(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.filter(pa.array(splitmix64(ids) < thr))

    sample = ds.map_batches(pick, batch_format="pyarrow")
    tbls = [b for b in sample.iter_batches(batch_format="pyarrow")]
    if not tbls:
        return np.zeros((0, 0))
    return _to_matrix(pa.concat_tables(tbls).column("embedding"))


def topk_cosine_ivf(
    ds,
    query,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    seed: int = 11,
    sample_p: float = 0.25,
):
    """IVF ANN: train a k-means coarse quantizer on a deterministic hash
    sample, assign every vector to its nearest centroid per batch, scan
    only the ``nprobe`` centroid lists nearest the query (~nprobe/n_centroids
    of the data), brute-force top-k over that slice. The second approximate
    scale path next to hyperplane LSH — data-adaptive buckets, better
    recall/scan-fraction on clustered embeddings."""
    import pyarrow.compute as pc
    import ray

    sample = _ivf_sample(ds, id_col, sample_p)
    cent = train_ivf_centroids(sample, n_centroids, seed=seed)
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    qu = q / (qn if qn else 1.0)
    probe_lists = np.argsort(-(cent @ qu))[: min(nprobe, len(cent))].astype(np.int32)
    probe = pa.array(probe_lists, pa.int32())
    cref = ray.put(cent)
    assigned = ds.map_batches(
        lambda b: _cached(IVFAssign, cref)(b), batch_format="pyarrow"
    )
    in_lists = assigned.map_batches(
        lambda b: b.filter(
            pc.fill_null(pc.is_in(b.column("ivf_list"), value_set=probe), False)
        ),
        batch_format="pyarrow",
    )
    return topk_cosine(in_lists, query, k=k, id_col=id_col)


def build_ivf_index(
    ds,
    out_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    seed: int = 11,
    sample_p: float = 0.25,
) -> np.ndarray:
    """Persist an IVF index as centroid-partitioned parquet
    (``out_dir/ivf_list=<i>/``) plus the centroid matrix. At scale this is
    the real win: a later search READS only the probed partitions from
    storage — file-level pruning, no full scan, no assignment pass."""
    import json
    import os

    sample = _ivf_sample(ds, id_col, sample_p)
    cent = train_ivf_centroids(sample, n_centroids, seed=seed)
    import ray

    cref = ray.put(cent)
    assigned = ds.map_batches(
        lambda b: _cached(IVFAssign, cref)(b), batch_format="pyarrow"
    )
    assigned.write_parquet(out_dir, partition_cols=["ivf_list"])
    np.save(os.path.join(out_dir, "_centroids.npy"), cent)
    with open(os.path.join(out_dir, "_ivf_meta.json"), "w") as f:
        json.dump({"n_centroids": int(len(cent)), "seed": seed}, f)
    return cent


def search_ivf_index(out_dir: str, query, nprobe: int = 4, k: int = 10,
                     id_col: str = "vec_id"):
    """Search a persisted IVF index reading ONLY the nprobe nearest
    partitions (directory-level pruning)."""
    import os

    import ray.data as rd

    cent = np.load(os.path.join(out_dir, "_centroids.npy"))
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    qu = q / (qn if qn else 1.0)
    import glob

    probe = np.argsort(-(cent @ qu))[: min(nprobe, len(cent))]
    paths = [
        f
        for i in probe
        for f in sorted(
            glob.glob(os.path.join(out_dir, f"ivf_list={int(i)}", "*.parquet"))
        )
    ]
    if not paths:
        return None
    ds = rd.read_parquet(paths)
    return topk_cosine(ds, query, k=k, id_col=id_col)


def topk_cosine_multi(ds, queries, k: int = 10, id_col: str = "vec_id"):
    """Batched ANN: top-k cosine neighbors for a MATRIX of query vectors in
    one corpus pass — the shape of dedup-against-eval-set / retrieval
    workloads (Q queries amortize one broadcast + one BLAS matmul per
    batch). Per-batch partials carry k rows per (batch, query); ONE
    bucketed exchange on query_idx finalizes with a vectorized segmented
    top-k — the corpus itself never shuffles."""
    import ray

    from ..pipelines.queries import _bucketed_map_groups, _cached
    from .sketch import topk_partial

    ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        lambda b: _cached(BruteForceTopK, ref, k, id_col)(b),
        batch_format="pyarrow",
    )
    return _bucketed_map_groups(
        partials,
        ["query_idx"],
        lambda g: topk_partial(g, "query_idx", "cos_sim", id_col, k),
    )
