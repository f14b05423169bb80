"""Unit tests for the temporal joins (stages/joins.py) and order-statistic /
sampling primitives (functions/sketch.py) — edge cases the sf-fixture parity
checks can't hit: timestamp ties, empty sides, window boundaries, duplicate
values in quantile histograms."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from bcdc2bcdc_ray.canonical import splitmix64
from bcdc2bcdc_ray.functions import sketch
from bcdc2bcdc_ray.stages import joins


def _ds(table: pa.Table, blocks: int = 2):
    return rd.from_arrow(table).repartition(blocks)


def test_asof_basic_ties_and_unmatched(ray_session):
    left = pa.table(
        {
            "lid": [1, 2, 3, 4],
            "k": [10, 10, 10, 99],
            "t": [5, 10, 3, 7],
        }
    )
    # key 10: rights at t=4 (r1), t=10 (r2a, r2b — tie, max tiebreak wins)
    right = pa.table(
        {
            "rid": [100, 200, 201],
            "k": [10, 10, 10],
            "t": [4, 10, 10],
        }
    )
    out = joins.asof_join(
        _ds(left),
        _ds(right),
        left_key="k",
        right_key="k",
        left_ts="t",
        right_ts="t",
        left_cols=["lid"],
        right_cols=["rid"],
        right_tiebreak="rid",
        n_buckets=2,
    ).to_pandas()
    got = dict(zip(out["lid"], out["rid"]))
    assert got[1] == 100  # t=5 → latest right at t=4
    assert got[2] == 201  # t=10 → exact-equal match, tie → max rid
    assert got[3] != got[3]  # t=3 precedes every right row → null (NaN)
    assert got[4] != got[4]  # key 99 has no right rows → null


def test_asof_unmatched_is_null(ray_session):
    left = pa.table({"lid": [1], "k": [5], "t": [0]})
    right = pa.table({"rid": [9], "k": [5], "t": [100]})
    out = joins.asof_join(
        _ds(left, 1),
        _ds(right, 1),
        left_key="k",
        right_key="k",
        left_ts="t",
        right_ts="t",
        left_cols=["lid"],
        right_cols=["rid"],
        n_buckets=2,
    ).to_pandas()
    assert len(out) == 1 and out["rid"].isna().all()


def test_asof_matches_pandas_merge_asof_shape(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    left = pa.table(
        {
            "lid": np.arange(n_l),
            "k": rng.integers(0, 12, n_l),
            "t": rng.integers(0, 1000, n_l),
        }
    )
    right = pa.table(
        {
            "rid": np.arange(n_r) + 1000,
            "k": rng.integers(0, 12, n_r),
            "t": rng.integers(0, 1000, n_r),
        }
    )
    out = (
        joins.asof_join(
            _ds(left, 3),
            _ds(right, 2),
            left_key="k",
            right_key="k",
            left_ts="t",
            right_ts="t",
            left_cols=["lid"],
            right_cols=["rid"],
            right_tiebreak="rid",
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    # dict oracle: max (t, rid) right row at or before each left t
    rk = right.column("k").to_numpy()
    rt = right.column("t").to_numpy()
    rid = right.column("rid").to_numpy()
    for row in out.itertuples():
        lk = left.column("k").to_numpy()[row.lid]
        lt = left.column("t").to_numpy()[row.lid]
        cand = [(rt[i], rid[i]) for i in range(n_r) if rk[i] == lk and rt[i] <= lt]
        exp = max(cand)[1] if cand else None
        if exp is None:
            assert row.rid != row.rid  # NaN
        else:
            assert int(row.rid) == exp
    assert len(out) == n_l


def test_range_join_window_boundaries_inclusive(ray_session):
    left = pa.table({"a": [1], "k": [7], "t": [100]})
    right = pa.table({"b": [10, 20, 30, 40], "k": [7] * 4, "t": [89, 90, 110, 111]})
    out = joins.range_join(
        _ds(left, 1),
        _ds(right, 1),
        left_key="k",
        right_key="k",
        left_ts="t",
        right_ts="t",
        left_cols=["a"],
        right_cols=["b"],
        lower_offset=-10,
        upper_offset=10,
        n_buckets=2,
    ).to_pandas()
    assert sorted(out["b"]) == [20, 30]  # both bounds inclusive


def test_range_join_empty_result_keeps_schema(ray_session):
    left = pa.table({"a": [1], "k": [7], "t": [0]})
    right = pa.table({"b": [10], "k": [8], "t": [0]})
    out = joins.range_join(
        _ds(left, 1),
        _ds(right, 1),
        left_key="k",
        right_key="k",
        left_ts="t",
        right_ts="t",
        left_cols=["a"],
        right_cols=["b"],
        lower_offset=-10,
        upper_offset=10,
        n_buckets=2,
    )
    assert out.count() == 0


def test_group_quantiles_matches_numpy(ray_session):
    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, 2000)
    v = rng.integers(-50, 50, 2000)
    ds = _ds(pa.table({"g": g, "v": v}), 4)
    out = (
        sketch.group_quantiles(ds, "g", "v", [0.25, 0.5, 0.9], ["q25", "q50", "q90"])
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    for row in out.itertuples():
        vals = np.sort(v[g == row.g])
        for q, got in ((0.25, row.q25), (0.5, row.q50), (0.9, row.q90)):
            exp = vals[int(np.ceil(q * len(vals))) - 1]  # quantile_disc
            assert got == exp, (row.g, q, got, exp)


def test_group_topk_deterministic_with_ties(ray_session):
    t = pa.table(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "g": ["x"] * 4 + ["y"] * 2,
            "score": [9, 9, 9, 1, 5, 5],
        }
    )
    out = (
        sketch.group_topk(_ds(t, 3), "g", "score", "id", 2)
        .to_pandas()
        .sort_values(["g", "id"], ignore_index=True)
    )
    # group x: three score-9 ties → ids 1,2 win (tiebreak asc); group y: both
    assert out[out["g"] == "x"]["id"].tolist() == [1, 2]
    assert out[out["g"] == "y"]["id"].tolist() == [5, 6]


def test_asof_broadcast_matches_shuffle_path(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 120
    left = pa.table(
        {
            "eid": np.arange(n_l),
            "k": rng.integers(0, 25, n_l),
            "t": rng.integers(0, 1000, n_l),
        }
    )
    right = pa.table(
        {
            "rid": np.arange(n_r),
            "k": rng.integers(0, 30, n_r),  # some keys absent on either side
            "t": rng.integers(0, 1000, n_r),
        }
    )
    kw = dict(
        left_key="k",
        right_key="k",
        left_ts="t",
        right_ts="t",
        left_cols=["eid"],
        right_cols=["rid"],
        right_tiebreak="rid",
    )
    shuffled = (
        joins.asof_join(_ds(left, 4), _ds(right, 3), n_buckets=4, **kw)
        .to_pandas()
        .sort_values("eid", ignore_index=True)
    )
    bcast = (
        joins.asof_join_broadcast(_ds(left, 4), right, **kw)
        .to_pandas()
        .sort_values("eid", ignore_index=True)
    )
    assert bcast.equals(shuffled)


def test_asof_broadcast_empty_right(ray_session):
    left = pa.table({"eid": [1, 2], "k": [1, 2], "t": [10, 20]})
    right = pa.table(
        {"rid": np.array([], np.int64), "k": np.array([], np.int64), "t": np.array([], np.int64)}
    )
    out = joins.asof_join_broadcast(
        _ds(left, 1),
        right,
        left_key="k",
        right_key="k",
        left_ts="t",
        right_ts="t",
        left_cols=["eid"],
        right_cols=["rid"],
    ).to_pandas()
    assert len(out) == 2 and out["rid"].isna().all()


def test_bit_length_u64_exact_near_float_boundaries():
    # values where a float64 round-trip misrounds the exponent
    vals = np.array(
        [0, 1, 2, 3, (1 << 53) - 1, 1 << 53, (1 << 53) + 1, (1 << 56) - 1, 1 << 55],
        dtype=np.uint64,
    )
    got = sketch._bit_length_u64(vals)
    exp = [int(v).bit_length() for v in vals.tolist()]
    assert got.tolist() == exp


def test_hll_distinct_accuracy_and_determinism(ray_session):
    # 50k distinct ids across 2 groups — deep in the raw-estimator regime;
    # standard HLL error for m=256 is 1.04/sqrt(256) ≈ 6.5%
    n = 50_000
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"g": np.where(ids % 2 == 0, "a", "b"), "k": ids * 7 + 13})
    out = (
        sketch.hll_distinct(_ds(t, 6), "g", "k")
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    assert out["g"].tolist() == ["a", "b"]
    for est in out["approx_distinct"]:
        assert abs(est - n / 2) / (n / 2) < 0.15
    # block layout must not change the estimate (register max is associative)
    out2 = (
        sketch.hll_distinct(_ds(t, 13), "g", "k")
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    assert out2["approx_distinct"].tolist() == out["approx_distinct"].tolist()


def test_heavy_hitters_sums_partials_across_blocks(ray_session):
    # key 7 appears 5x spread over blocks; per-block partial counts must SUM
    # before top-k, or a split key loses to a locally-dense one
    g = ["x"] * 9
    keys = [7, 7, 1, 1, 1, 7, 7, 7, 2]
    t = pa.table({"g": g, "k": keys})
    out = (
        sketch.heavy_hitters(_ds(t, 4), "g", "k", 2)
        .to_pandas()
        .sort_values("n", ascending=False, ignore_index=True)
    )
    assert out[["k", "n"]].values.tolist() == [[7, 5], [1, 3]]


def test_group_hash_sample_fixed_size_and_deterministic(ray_session):
    ids = np.arange(300, dtype=np.int64)
    t = pa.table({"doc_id": ids, "g": np.where(ids % 3 == 0, "a", "b")})
    out = sketch.group_hash_sample(_ds(t, 4), "g", "doc_id", 4).to_pandas()
    assert out.groupby("g").size().tolist() == [4, 4]
    # matches the direct definition: smallest splitmix64(id) per group
    h = splitmix64(ids.astype(np.uint64))
    for grp, mask in [("a", ids % 3 == 0), ("b", ids % 3 != 0)]:
        exp = set(ids[mask][np.argsort(h[mask], kind="stable")][:4].tolist())
        assert set(out[out["g"] == grp]["doc_id"]) == exp
    out2 = sketch.group_hash_sample(_ds(t, 9), "g", "doc_id", 4).to_pandas()
    assert set(map(tuple, out2.values.tolist())) == set(map(tuple, out.values.tolist()))


def test_connected_components_path_star_multi(ray_session):
    from bcdc2bcdc_ray.functions import dedup

    def check(pairs, expect, iters=4):
        t = pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
        out = dedup.connected_components(_ds(t, 3), iters=iters).to_pandas()
        assert dict(zip(out["doc_id"], out["component"])) == expect

    # path graph of diameter 15 — hash-to-min doubles reach each round
    check([(i, i + 1) for i in range(15)], {i: 0 for i in range(16)})
    # two components, reversed ids, duplicate edges
    check([(5, 3), (3, 5), (9, 7), (100, 9)], {3: 3, 5: 3, 7: 7, 9: 7, 100: 7})
    # star
    check([(50, i) for i in range(10)], {i: 0 for i in range(10)} | {50: 0})


def test_hash_sample_matches_direct_mixer(ray_session):
    ids = np.arange(1000, dtype=np.int64)
    t = pa.table({"doc_id": ids, "x": ids * 2})
    out = sketch.hash_sample(_ds(t, 3), "doc_id", 0.25).to_pandas()
    thr = np.uint64(1 << 62)
    exp = ids[splitmix64(ids.astype(np.uint64)) < thr]
    assert sorted(out["doc_id"]) == sorted(exp.tolist())
    # deterministic: a second run returns the identical sample
    out2 = sketch.hash_sample(_ds(t, 5), "doc_id", 0.25).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def _hj_collect(out) -> pa.Table:
    df = out.to_pandas()
    return pa.Table.from_pandas(df, preserve_index=False)


def test_hash_join_inner_and_left_outer(ray_session):
    left = pa.table({"k": [1, 1, 2, 3], "lv": [10, 11, 20, 30]})
    right = pa.table({"k": [1, 2, 2, 9], "rv": ["a", "b", "c", "z"]})
    inner = _hj_collect(
        joins.hash_join(
            _ds(left), _ds(right), on=["k"], left_cols=["lv"],
            right_cols=["rv"], how="inner", n_buckets=4,
        )
    ).to_pandas().sort_values(["k", "lv", "rv"], ignore_index=True)
    # k=1 matches once for each left row; k=2 fans out 2x; k=3 drops
    assert inner.values.tolist() == [
        [1, 10, "a"], [1, 11, "a"], [2, 20, "b"], [2, 20, "c"]
    ]
    outer = _hj_collect(
        joins.hash_join(
            _ds(left), _ds(right), on=["k"], left_cols=["lv"],
            right_cols=["rv"], how="left outer", n_buckets=4,
        )
    ).to_pandas()
    assert len(outer) == 5
    unmatched = outer[outer["k"] == 3]
    assert unmatched["rv"].isna().all()


def test_hash_join_composite_key_no_hash_collision_false_match(ray_session):
    left = pa.table({"a": [1, 1], "b": ["x", "y"], "lv": [1, 2]})
    right = pa.table({"a": [1, 1], "b": ["x", "z"], "rv": [100, 300]})
    out = _hj_collect(
        joins.hash_join(
            _ds(left), _ds(right), on=["a", "b"], left_cols=["lv"],
            right_cols=["rv"], how="inner", n_buckets=2,
        )
    ).to_pandas()
    # only (1,'x') matches — the join compares values, not hashes
    assert out.values.tolist() == [[1, "x", 1, 100]]


def test_hash_join_empty_side_keeps_schema(ray_session):
    left = pa.table({"k": [1, 2], "lv": [10, 20]})
    right = pa.table({"k": pa.array([], pa.int64()), "rv": pa.array([], pa.string())})
    # NOT repartitioned: Ray drops the schema of an empty dataset on
    # repartition, and hash_join (like asof_join) types its union schema
    # from both sides' schemas
    out = _hj_collect(
        joins.hash_join(
            _ds(left), rd.from_arrow(right), on=["k"], left_cols=["lv"],
            right_cols=["rv"], how="left outer", n_buckets=2,
        )
    ).to_pandas()
    assert sorted(out.columns) == ["k", "lv", "rv"]
    assert len(out) == 2 and out["rv"].isna().all()


def test_hash_join_salted_matches_unsalted(ray_session):
    """Skew salting is a pure performance transform: with a hot key salted
    (probe side spread, build side replicated per sub-key) the inner and
    left-outer results must equal the unsalted join exactly."""
    rng = np.random.default_rng(7)
    n = 2000
    # 70% of probe rows hit key 42; build side has multiple rows for it
    lk = np.where(rng.random(n) < 0.7, 42, rng.integers(0, 50, n)).astype(np.int64)
    left = pa.table({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    right = pa.table(
        {
            "k": pa.array([42, 42, 1, 2, 3, 99], pa.int64()),
            "rv": ["a", "b", "c", "d", "e", "z"],
        }
    )

    def run(**kw):
        out = joins.hash_join(
            _ds(left, blocks=4), _ds(right), on=["k"], left_cols=["lv"],
            right_cols=["rv"], n_buckets=8, **kw,
        ).to_pandas()
        return out.sort_values(list(out.columns), ignore_index=True)

    for how in ("inner", "left outer"):
        plain = run(how=how)
        salted = run(how=how, hot_keys=[42], salt=4)
        assert plain.equals(salted), how


def test_hash_join_salted_rejects_composite_key(ray_session):
    left = pa.table({"a": [1], "b": [2], "lv": [3]})
    with pytest.raises(ValueError):
        joins.hash_join(
            _ds(left), _ds(left), on=["a", "b"], left_cols=["lv"],
            right_cols=[], hot_keys=[1],
        )


def test_detect_hot_keys_flags_dominant_key(ray_session):
    rng = np.random.default_rng(3)
    n = 4000
    k = np.where(rng.random(n) < 0.6, 7, rng.integers(100, 200, n)).astype(np.int64)
    ds = _ds(pa.table({"k": k, "v": np.arange(n)}), 4)
    hot = joins.detect_hot_keys(ds, "k", n_buckets=8)
    assert 7 in hot
    assert all(int((k == h).sum()) > n // 20 for h in hot)  # no cold flags


def test_skew_join_matches_plain_hash_join(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    lk = np.where(rng.random(n) < 0.5, 9, rng.integers(0, 40, n)).astype(np.int64)
    left = pa.table({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    right = pa.table(
        {"k": np.arange(0, 45, dtype=np.int64), "rv": np.arange(45) * 10}
    )
    kw = dict(on=["k"], left_cols=["lv"], right_cols=["rv"], n_buckets=8)
    for how in ("inner", "left outer"):
        plain = joins.hash_join(_ds(left, 4), _ds(right), how=how, **kw).to_pandas()
        auto = joins.skew_join(_ds(left, 4), _ds(right), how=how, **kw).to_pandas()
        plain = plain.sort_values(list(plain.columns), ignore_index=True)
        auto = auto.sort_values(list(auto.columns), ignore_index=True)
        assert plain.equals(auto), how


# ---------------------------------------------------------------------------
# Bloom filter + semi/anti join (stages/joins.semi_join, functions/bloom.py)
# ---------------------------------------------------------------------------

from bcdc2bcdc_ray.functions import bloom as bl


def test_bloom_no_false_negatives_and_bounded_fpr():
    rng = np.random.default_rng(5)
    present = rng.integers(0, 1 << 62, 5000, dtype=np.uint64)
    absent = present + np.uint64(1 << 62)  # disjoint by construction
    bf = bl.BloomFilter(num_bits=1 << 20, num_hashes=5)
    bf.add_hashes(present)
    assert bf.contains_hashes(present).all()  # zero false negatives, ever
    fpr = bf.contains_hashes(absent).mean()
    assert fpr < 0.05  # m/n=200 bits/key, k=5 → theoretical fpr ~1e-5


def test_bloom_bytes_roundtrip_and_merge():
    a = bl.BloomFilter(1 << 16, 4)
    b = bl.BloomFilter(1 << 16, 4)
    ha = np.arange(100, dtype=np.uint64)
    hb = np.arange(100, 200, dtype=np.uint64)
    a.add_hashes(ha)
    b.add_hashes(hb)
    a.merge_words(np.frombuffer(b.to_bytes(), dtype=np.uint64))
    rt = bl.BloomFilter.from_bytes(a.to_bytes(), 4)
    assert rt.contains_hashes(np.concatenate([ha, hb])).all()
    with pytest.raises(ValueError):
        bl.BloomFilter(1000)  # not a power of two


def test_semi_and_anti_join_match_pandas_with_and_without_bloom(ray_session):
    rng = np.random.default_rng(13)
    n = 2500
    lk = rng.integers(0, 60, n).astype(np.int64)
    left = pa.table({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    rk = np.unique(rng.integers(0, 30, 40).astype(np.int64))
    right = pa.table({"k": np.repeat(rk, 2)})  # dup right keys: still one match
    in_right = np.isin(lk, rk)
    for anti in (False, True):
        expect = set(np.flatnonzero(~in_right if anti else in_right).tolist())
        for bits in (None, 1 << 16):
            out = joins.semi_join(
                _ds(left, 4),
                _ds(right),
                on=["k"],
                left_cols=["k", "lv"],
                anti=anti,
                n_buckets=4,
                bloom_bits=bits,
            ).to_pandas()
            assert set(out["lv"].tolist()) == expect, (anti, bits)
            # row multiplicity preserved: semi/anti filter, never duplicate
            assert len(out) == len(expect), (anti, bits)


def test_semi_join_null_keys_never_match(ray_session):
    left = pa.table(
        {"k": pa.array([1, None, 3], pa.int64()), "lv": [10, 20, 30]}
    )
    right = pa.table({"k": pa.array([1, None], pa.int64())})
    semi = joins.semi_join(
        _ds(left, 1), _ds(right, 1), on=["k"], left_cols=["lv"], n_buckets=2
    ).to_pandas()
    assert sorted(semi["lv"]) == [10]  # null = null is not a match
    anti = joins.semi_join(
        _ds(left, 1),
        _ds(right, 1),
        on=["k"],
        left_cols=["lv"],
        anti=True,
        n_buckets=2,
        bloom_bits=1 << 16,
    ).to_pandas()
    assert sorted(anti["lv"]) == [20, 30]  # NOT EXISTS keeps the null row


# ---------------------------------------------------------------------------
# Broadcast join + auto_join planner (stages/joins.py)
# ---------------------------------------------------------------------------


def test_broadcast_join_matches_hash_join(ray_session):
    rng = np.random.default_rng(17)
    n = 2500
    lk = rng.integers(0, 60, n).astype(np.int64)
    left = pa.table({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    right = pa.table(
        {"k": np.arange(0, 50, dtype=np.int64), "rv": np.arange(50) * 3}
    )
    kw = dict(on=["k"], left_cols=["lv"], right_cols=["rv"])
    for how in ("inner", "left outer"):
        plain = joins.hash_join(
            _ds(left, 4), _ds(right), how=how, n_buckets=8, **kw
        ).to_pandas()
        bcast = joins.broadcast_join(
            _ds(left, 4), right, how=how, **kw
        ).to_pandas()
        plain = plain.sort_values(list(plain.columns), ignore_index=True)
        bcast = bcast.sort_values(list(bcast.columns), ignore_index=True)
        assert plain.astype(bcast.dtypes.to_dict()).equals(bcast), how


def test_auto_join_both_plans_result_identical(ray_session):
    rng = np.random.default_rng(23)
    n = 3000
    lk = np.where(rng.random(n) < 0.4, 5, rng.integers(0, 30, n)).astype(np.int64)
    left = pa.table({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    right = pa.table(
        {"k": np.arange(0, 35, dtype=np.int64), "rv": np.arange(35) * 7}
    )
    kw = dict(on=["k"], left_cols=["lv"], right_cols=["rv"], n_buckets=8)
    for how in ("inner", "left outer"):
        ref = joins.hash_join(_ds(left, 4), _ds(right), how=how, **kw).to_pandas()
        # threshold huge -> broadcast plan; threshold 0 -> skew/shuffle plan
        small = joins.auto_join(
            _ds(left, 4), _ds(right), how=how,
            broadcast_threshold=1 << 40, **kw,
        ).to_pandas()
        big = joins.auto_join(
            _ds(left, 4), _ds(right), how=how, broadcast_threshold=0, **kw
        ).to_pandas()
        ref = ref.sort_values(list(ref.columns), ignore_index=True)
        for got in (small, big):
            got = got.sort_values(list(got.columns), ignore_index=True)
            assert ref.astype(got.dtypes.to_dict()).equals(got), how


def test_auto_join_empty_right_keeps_schema(ray_session):
    left = pa.table({"k": [1, 2], "lv": [10, 20]})
    right = pa.table(
        {"k": pa.array([], pa.int64()), "rv": pa.array([], pa.string())}
    )
    out = joins.auto_join(
        _ds(left, 1), rd.from_arrow(right), on=["k"], left_cols=["lv"],
        right_cols=["rv"], how="left outer",
    ).to_pandas()
    assert sorted(out.columns) == ["k", "lv", "rv"]
    assert len(out) == 2 and out["rv"].isna().all()


def test_hash_join_full_outer_matches_pandas(ray_session):
    rng = np.random.default_rng(29)
    n = 1500
    lk = rng.integers(0, 40, n).astype(np.int64)  # keys 0..39
    left = pa.table({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    right = pa.table(
        {"k": np.arange(20, 60, dtype=np.int64), "rv": np.arange(40) * 2}
    )  # keys 20..59: 0..19 left-only, 40..59 right-only
    out = joins.hash_join(
        _ds(left, 4), _ds(right), on=["k"], left_cols=["lv"],
        right_cols=["rv"], how="full outer", n_buckets=8,
    ).to_pandas()
    exp = (
        left.to_pandas()
        .merge(right.to_pandas(), on="k", how="outer")
        .astype({"lv": "float64", "rv": "float64"})
    )
    out = out.astype({"lv": "float64", "rv": "float64"})
    out = out.sort_values(list(out.columns), ignore_index=True)
    exp = exp.sort_values(list(out.columns), ignore_index=True)[out.columns]
    assert out.equals(exp)
    # unmatched survive from BOTH sides
    assert out[out["rv"].isna()]["k"].between(0, 19).all()
    assert out[out["lv"].isna()]["k"].between(40, 59).all()


def test_hash_join_full_outer_rejects_salting(ray_session):
    left = pa.table({"k": [1], "lv": [2]})
    with pytest.raises(ValueError):
        joins.hash_join(
            _ds(left), _ds(left), on=["k"], left_cols=["lv"],
            right_cols=[], how="full outer", hot_keys=[1],
        )
    # skew_join silently skips salting for full outer instead
    out = joins.skew_join(
        _ds(left), _ds(pa.table({"k": [1, 9], "rv": [5, 6]})), on=["k"],
        left_cols=["lv"], right_cols=["rv"], how="full outer", n_buckets=2,
    ).to_pandas()
    assert len(out) == 2  # matched (1) + right-only (9)


def test_rank_from_histogram_matches_sql_rank():
    vals = np.array([30, 10, 20, 10, 30, 30], np.int64)
    # histogram: 10->2, 20->1, 30->3
    u, c = np.unique(vals, return_counts=True)
    vs, ranks = sketch.rank_from_histogram(u, c)
    assert vs.tolist() == [10, 20, 30] and ranks.tolist() == [1, 3, 4]
    t = pa.table({"v": vals})
    out = sketch.rank_batch(t, "v", vs, ranks).column("rnk").to_pylist()
    # pandas rank(method='min') == SQL RANK()
    import pandas as pd
    expect = pd.Series(vals).rank(method="min").astype(int).tolist()
    assert out == expect


def test_split_assign_stable_under_append():
    """A row's split never changes when more rows arrive (hash-range
    property), fractions land near target, salts decorrelate."""
    ids_small = np.arange(500, dtype=np.int64)
    ids_big = np.arange(2000, dtype=np.int64)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = sketch.split_assign_batch(
        pa.table({"id": ids_small}), "id", fr
    ).column("split").to_pylist()
    big = sketch.split_assign_batch(
        pa.table({"id": ids_big}), "id", fr
    ).column("split").to_pylist()
    assert big[:500] == small  # append-stable
    frac_train = big.count("train") / len(big)
    assert 0.75 < frac_train < 0.85
    assert set(big) == {"train", "val", "test"}
    other = sketch.split_assign_batch(
        pa.table({"id": ids_big}), "id", fr, salt=1
    ).column("split").to_pylist()
    assert other != big  # independent split under a different salt


def test_histogram_quantiles_within_one_bin(ray_session):
    rng = np.random.default_rng(47)
    v = rng.gamma(2.0, 10.0, 20_000)
    ds = rd.from_arrow(pa.table({"value": v})).repartition(4)
    out = sketch.histogram_quantiles(ds, "value", [0.5, 0.9], bins=1024)
    got = dict(zip(out.column("q").to_pylist(), out.column("estimate").to_pylist()))
    width = (v.max() - v.min()) / 1024
    for q in (0.5, 0.9):
        assert abs(got[q] - np.quantile(v, q)) <= 2 * width, q
    # constant column degenerates gracefully
    const = rd.from_arrow(pa.table({"value": np.full(10, 3.5)}))
    out2 = sketch.histogram_quantiles(const, "value", [0.5])
    assert out2.column("estimate").to_pylist() == [3.5]


def test_auto_join_full_outer_never_broadcasts(ray_session):
    """full outer through auto_join must take the shuffle plan even when
    the right side is tiny — a per-batch broadcast full outer would emit
    one spurious unmatched-right copy per left block (review finding)."""
    left = pa.table({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    right = pa.table({"k": [3, 4, 9], "rv": ["a", "b", "z"]})
    out = joins.auto_join(
        _ds(left, 4), _ds(right), on=["k"], left_cols=["lv"],
        right_cols=["rv"], how="full outer",
        broadcast_threshold=1 << 40,  # would have broadcast before the fix
    ).to_pandas()
    # exactly ONE row for the unmatched right key, not one per left block
    assert len(out) == 5
    assert (out["k"] == 9).sum() == 1
    with pytest.raises(ValueError):
        joins.broadcast_join(
            _ds(left), right, on=["k"], left_cols=["lv"],
            right_cols=["rv"], how="full outer",
        )


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),        # group
            st.integers(-50, 50),     # order value (ties likely)
            st.integers(0, 10_000),   # tiebreak id
        ),
        min_size=0,
        max_size=120,
    ),
    k=st.integers(1, 6),
    asc=st.booleans(),
)
def test_topk_partial_matches_pandas_reference(rows, k, asc):
    """topk_partial (the combiner under group_topk, stratified sampling,
    heavy hitters and multi-query ANN) must equal the pandas reference
    top-k per group with (order ±, tiebreak asc) under arbitrary ties."""
    t = pa.table(
        {
            "g": pa.array([r[0] for r in rows], pa.int64()),
            "o": pa.array([r[1] for r in rows], pa.int64()),
            "id": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    got = sketch.topk_partial(t, "g", "o", "id", k, asc=asc).to_pandas()
    got = got.sort_values(["g", "o", "id"], ignore_index=True)
    import pandas as pd

    df = t.to_pandas()
    exp = (
        df.sort_values(["g", "o", "id"], ascending=[True, asc, True])
        .groupby("g", sort=True)
        .head(k)
        .sort_values(["g", "o", "id"], ignore_index=True)
    )
    assert got.values.tolist() == exp.values.tolist()
