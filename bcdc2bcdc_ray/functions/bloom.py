"""Bloom-filter semi-join pre-filter — the classic 100 TB join optimization.

When a huge probe side joins a selective build side, most probe rows match
nothing; shipping them through the all-to-all exchange is pure waste. A
Bloom filter over the build side's join keys costs a fixed few MiB,
broadcasts once (``ray.put``), and lets every probe batch drop
definitely-unmatched rows BEFORE the shuffle — no false negatives, and the
exact join downstream discards the false positives, so results are
bit-identical to the unfiltered join.

The reference engine's analog is its key-set intersection step
(``/root/reference/bcdc2bcdc/CKANData.py:1468-1502`` builds full Python
``set``s of both sides' ids before diffing — fine at CKAN scale, impossible
at 100 TB). The Bloom filter is the fixed-memory replacement: the build
side's key SET is compressed to a bit array whose size is chosen, not
data-dependent.

Everything is vectorized: k hash positions per key come from double hashing
(h1 + i*h2, the Kirsch–Mitzenmacher construction over two splitmix64
finalizes of the canonical key hash), bit sets/tests are numpy word ops,
and the distributed build is per-block partial filters OR-merged through a
small tree (≤16 intermediate bitmap rows) so the driver touches a handful
of bitmaps, never one per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..canonical import key_hash, splitmix64

_H2_TWEAK = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


class BloomFilter:
    """Fixed-size Bloom filter over uint64 key hashes.

    ``num_bits`` must be a power of two (mask instead of modulo);
    ``num_hashes`` probes per key. The default (2^23 bits = 1 MiB,
    k=5) holds ~1M keys at ~2% false-positive rate; size up for bigger
    build sides (fpr ≈ (1 - e^(-k·n/m))^k).
    """

    def __init__(self, num_bits: int = 1 << 23, num_hashes: int = 5):
        if num_bits & (num_bits - 1):
            raise ValueError("num_bits must be a power of two")
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.words = np.zeros(self.num_bits >> 6, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing; ``h`` is the canonical
        uint64 key hash (already well-mixed — splitmix64 derives two
        independent streams from it)."""
        h = np.asarray(h, dtype=np.uint64)
        h1 = splitmix64(h)
        h2 = splitmix64(h ^ _H2_TWEAK) | np.uint64(1)  # odd → full period
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            pos = h1[None, :] + i * h2[None, :]
        return pos & np.uint64(self.num_bits - 1)

    def add_hashes(self, h: np.ndarray) -> None:
        pos = self._positions(h).ravel()
        np.bitwise_or.at(
            self.words,
            pos >> np.uint64(6),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Boolean mask: True = possibly present (no false negatives)."""
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        bits = (
            self.words[pos >> np.uint64(6)] >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=0)

    def merge_words(self, words: np.ndarray) -> None:
        np.bitwise_or(self.words, words, out=self.words)

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, num_hashes: int) -> "BloomFilter":
        n_words = len(data) // 8
        bf = cls.__new__(cls)
        bf.num_bits = n_words << 6
        bf.num_hashes = int(num_hashes)
        bf.words = np.frombuffer(data, dtype=np.uint64).copy()
        return bf


def build_bloom(
    ds,
    key_cols: list[str],
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    fanin: int = 16,
):
    """Distributed Bloom build over a Dataset's join keys → an ObjectRef to
    the final filter (``ray.put`` once; probe stages resolve it per worker).

    Shape: each block builds a partial filter (vectorized add of its
    ``key_hash`` values) and emits ONE bitmap row tagged with a fan-in
    bucket; a bucketed ``map_groups`` OR-merges within each of ≤``fanin``
    buckets; the driver ORs the surviving ≤``fanin`` bitmaps. At 100 TB the
    driver handles ``fanin`` × (num_bits/8) bytes, independent of block
    count.
    """
    import ray

    from ..pipelines.queries import _bucketed_map_groups

    keys = list(key_cols)

    def partial(b: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits, num_hashes)
        if b.num_rows:
            bf.add_hashes(key_hash(b, keys))
        # fan-in bucket from the first key hash — any spread works, the
        # merge is a commutative OR
        g = int(key_hash(b, keys)[0] % fanin) if b.num_rows else 0
        return pa.table(
            {
                "g": pa.array([g], pa.int32()),
                "bitmap": pa.array([bf.to_bytes()], pa.binary()),
            }
        )

    def or_group(g: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits, num_hashes)
        for buf in g.column("bitmap"):
            bf.merge_words(np.frombuffer(buf.as_py(), dtype=np.uint64))
        return pa.table(
            {
                "g": g.column("g").slice(0, 1),
                "bitmap": pa.array([bf.to_bytes()], pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = _bucketed_map_groups(partials, ["g"], or_group, n_buckets=fanin)
    final = BloomFilter(num_bits, num_hashes)
    for b in merged.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b.column("bitmap"):
            final.merge_words(np.frombuffer(buf.as_py(), dtype=np.uint64))
    return ray.put({"bitmap": final.to_bytes(), "num_hashes": num_hashes})


class _BloomProbe:
    """Per-worker resolved filter (built once per process via ``_cached``)."""

    def __init__(self, ref):
        import ray

        d = ray.get(ref)
        self.bf = BloomFilter.from_bytes(d["bitmap"], d["num_hashes"])


def bloom_filter_batches(ds, ref, key_cols: list[str], keep_maybe: bool = True):
    """Stream ``ds`` through the broadcast filter: ``keep_maybe=True`` keeps
    rows POSSIBLY in the build side (semi-join prefilter — false positives
    pass, the exact join removes them); ``keep_maybe=False`` keeps rows
    DEFINITELY absent (the safe anti-join half — a bloom miss is proof of
    absence, a hit is not proof of presence)."""
    keys = list(key_cols)

    def probe(b: pa.Table) -> pa.Table:
        from ..pipelines.queries import _cached

        if b.num_rows == 0:
            return b
        bf = _cached(_BloomProbe, ref).bf
        mask = bf.contains_hashes(key_hash(b, keys))
        if not keep_maybe:
            mask = ~mask
        return b.filter(pa.array(mask))

    return ds.map_batches(probe, batch_format="pyarrow")
