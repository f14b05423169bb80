"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference only deduplicates exactly, by unique-id insert guard and
duplicate-email group drop (``/root/reference/bcdc2bcdc/CKANData.py:920-922,
1582-1637`` — SURVEY §2.7 D2/D3). A training-data engine needs the full
near-dup toolbox; these follow the standard public constructions
(Broder '97 MinHash / LSH banding; Charikar '02 SimHash).

Scale design:
- signatures are computed per batch in ``map_batches`` (numpy vectorized
  over token hashes — no Python loop over shingles);
- LSH bucketing is a ``flat_map``-shaped explode to (band, band_hash,
  doc_id) rows followed by ONE ``groupby`` — the only shuffle; candidate
  verification happens inside each group;
- exact dedup is hash-partition + per-group min (no global sort).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)


def _token_hashes(text: str, n: int = 3) -> np.ndarray:
    """uint64 hashes of word n-gram shingles: deterministic crc32 per word
    (NOT Python hash(), which is per-process randomized and would give every
    Ray worker different signatures), combined across the n-gram with an
    FNV-style fold in numpy."""
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    wh = np.array(
        [zlib.crc32(w.encode("utf-8")) for w in words], dtype=np.uint64
    )
    if len(wh) < n:
        return np.array([wh.sum()], dtype=np.uint64)
    with np.errstate(over="ignore"):
        out = wh[: len(wh) - n + 1].copy()
        for k in range(1, n):
            out = out * np.uint64(1099511628211) + wh[k : len(wh) - n + 1 + k]
    return out


class MinHasher:
    """Per-actor state: the (a, b) permutation coefficients (num_perm of
    them) built once in ``__init__``; ``__call__`` adds a fixed-size
    ``list<uint64>`` minhash signature column."""

    def __init__(self, num_perm: int = 64, shingle: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle

    def signature(self, text: str | None) -> np.ndarray:
        if not text:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        h = _token_hashes(text, self.shingle)
        if len(h) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) permuted matrix → row min
            m = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(v) for v in batch.column("text").to_pylist()]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(sigs), pa.uint64()), self.num_perm
        )
        return batch.append_column("minhash", arr)


_MH_CACHE: dict = {}


def minhash_batch(
    batch: pa.Table, num_perm: int = 64, shingle: int = 3, seed: int = 1234
) -> pa.Table:
    """Task-friendly MinHasher: per-worker-process cached state. The
    permutation table is 2×num_perm uint64 — too cheap to justify an actor
    pool's startup cost per execution; a module-level cache gives the same
    build-once-per-worker behavior under plain ``map_batches`` tasks."""
    key = (num_perm, shingle, seed)
    mh = _MH_CACHE.get(key)
    if mh is None:
        mh = _MH_CACHE[key] = MinHasher(num_perm, shingle, seed)
    return mh(batch)


def lsh_bands(batch: pa.Table, num_bands: int = 16, id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band, band_hash, doc_id) rows — the LSH
    bucketing key. One output row per (doc, band); the following
    ``groupby(["band", "band_hash"])`` co-locates near-dup candidates."""
    sig = np.asarray(batch.column("minhash").combine_chunks().flatten(), dtype=np.uint64)
    n = batch.num_rows
    num_perm = len(sig) // max(n, 1)
    rows_per_band = num_perm // num_bands
    sig = sig.reshape(n, num_bands, rows_per_band)
    with np.errstate(over="ignore"):
        bh = np.zeros((n, num_bands), dtype=np.uint64)
        for k in range(rows_per_band):
            bh = bh * np.uint64(1099511628211) ^ sig[:, :, k]
    ids = np.repeat(
        batch.column(id_col).to_numpy(zero_copy_only=False), num_bands
    )
    bands = np.tile(np.arange(num_bands, dtype=np.int32), n)
    return pa.table(
        {
            id_col: pa.array(ids),
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
        }
    )


def candidate_pairs(group: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Within one LSH bucket: emit unordered candidate (a, b) id pairs."""
    ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
    if len(ids) < 2:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    ii, jj = np.triu_indices(len(ids), k=1)
    return pa.table(
        {"a": pa.array(ids[ii], pa.int64()), "b": pa.array(ids[jj], pa.int64())}
    )


def candidate_pairs_grouped(
    tbl: pa.Table,
    id_col: str = "doc_id",
    bucket_cols: tuple = ("band", "band_hash"),
) -> pa.Table:
    """Shuffle-bucket variant of :func:`candidate_pairs`: one call receives
    MANY LSH buckets (co-located by hash of ``bucket_cols``) and groups them
    internally — one Python dispatch per shuffle bucket instead of one per
    LSH bucket."""
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    b0 = tbl.column(bucket_cols[0]).to_numpy(zero_copy_only=False)
    b1 = tbl.column(bucket_cols[1]).to_numpy(zero_copy_only=False)
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, b1, b0))
    b0s, b1s, ids_s = b0[order], b1[order], ids[order]
    new = np.flatnonzero((b0s[1:] != b0s[:-1]) | (b1s[1:] != b1s[:-1])) + 1
    bounds = np.concatenate(([0], new, [len(ids_s)]))
    out_a, out_b = [], []
    for i in range(len(bounds) - 1):
        seg = np.unique(ids_s[bounds[i] : bounds[i + 1]])
        if len(seg) >= 2:
            ii, jj = np.triu_indices(len(seg), k=1)
            out_a.append(seg[ii])
            out_b.append(seg[jj])
    if not out_a:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def jaccard_ngram(a: str | None, b: str | None, n: int = 3) -> float:
    """Exact word-n-gram Jaccard for candidate verification."""
    sa, sb = set(_token_hashes(a or "", n)), set(_token_hashes(b or "", n))
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


class PairJaccardVerifier:
    """Verify LSH candidate pairs with EXACT word-n-gram Jaccard — the
    verification half of the MinHash pipeline (candidates from banding are a
    superset; this removes false positives).

    ``texts_ref`` is a broadcast id→text mapping (``ray.put`` once on the
    driver, resolved once per actor here — never re-shipped per batch). At
    test scale the full text map broadcasts; the 100 TB path replaces the
    broadcast with a hash join of the (small) candidate-pair set back against
    the documents table on doc_id before this stage.
    """

    def __init__(self, texts_ref, n: int = 3, threshold: float = 0.5):
        import ray

        t = ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        if isinstance(t, pa.Table):
            ids = t.column(t.column_names[0]).to_pylist()
            txts = t.column(t.column_names[1]).to_pylist()
            t = dict(zip(ids, txts))
        self.texts = t
        self.n = n
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        # per-pair loop is over the LSH-pruned candidate set (tiny vs corpus)
        jac = np.array(
            [
                jaccard_ngram(self.texts.get(x), self.texts.get(y), self.n)
                for x, y in zip(a, b)
            ],
            dtype=np.float64,
        )
        keep = jac >= self.threshold
        out = batch.filter(pa.array(keep))
        return out.append_column("jaccard", pa.array(jac[keep], pa.float64()))


class SimHasher:
    """64-bit SimHash (Charikar) over word-token hashes — per-batch numpy
    bit-vote accumulation; Hamming distance ≤ k defines near-dups."""

    def __init__(self, seed: int = 99):
        self.seed = seed

    def simhash(self, text: str | None) -> int:
        if not text:
            return 0
        th = _token_hashes(text, 1)
        if len(th) == 0:
            return 0
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = bits.sum(axis=0) * 2 - len(th)
        return int(
            np.bitwise_or.reduce(
                (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            )
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self.simhash(v) for v in batch.column("text").to_pylist()]
        return batch.append_column("simhash", pa.array(vals, pa.uint64()))


_SH_CACHE: dict = {}


def simhash_batch(batch: pa.Table, seed: int = 99) -> pa.Table:
    """Task-friendly SimHasher (state is just a seed — worker-cached
    instance under plain ``map_batches`` tasks, no actor-pool startup)."""
    sh = _SH_CACHE.get(seed)
    if sh is None:
        sh = _SH_CACHE[seed] = SimHasher(seed)
    return sh(batch)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def embedding_neardup_pairs(
    group: pd.DataFrame, threshold: float = 0.95, id_col: str = "vec_id"
) -> pd.DataFrame:
    """Within one bucket: all-pairs cosine over the embedding matrix; emit
    pairs above threshold. Used downstream of an LSH/length bucketing
    groupby so the quadratic stays bucket-local."""
    mat = np.stack(group["embedding"].to_numpy())
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    sim = unit @ unit.T
    ii, jj = np.triu_indices(len(group), k=1)
    keep = sim[ii, jj] >= threshold
    ids = group[id_col].to_numpy()
    return pd.DataFrame(
        {
            "a": ids[ii[keep]].astype(np.int64),
            "b": ids[jj[keep]].astype(np.int64),
            "cos": sim[ii, jj][keep].astype(np.float64),
        }
    )
