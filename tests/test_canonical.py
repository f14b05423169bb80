"""Unit tests for the canonicalization + content-hash kernel (no Ray)."""

import numpy as np
import pyarrow as pa

from bcdc2bcdc_ray import canonical


def test_falsy_to_null():
    arr = pa.chunked_array([pa.array(["a", "", "None", None, "b"])])
    out = canonical.falsy_to_null(arr)
    assert out.to_pylist() == ["a", None, None, None, "b"]


def test_falsy_to_null_non_string_passthrough():
    arr = pa.chunked_array([pa.array([1, 2, None])])
    assert canonical.falsy_to_null(arr).to_pylist() == [1, 2, None]


def test_content_hash_detects_change():
    t1 = pa.table({"a": ["x", "y"], "b": [1, 2]})
    t2 = pa.table({"a": ["x", "z"], "b": [1, 2]})
    h1 = canonical.content_hash(t1, ["a", "b"])
    h2 = canonical.content_hash(t2, ["a", "b"])
    assert h1[0] == h2[0] and h1[1] != h2[1]


def test_content_hash_column_order_sensitive():
    t = pa.table({"a": ["x"], "b": ["y"]})
    assert canonical.content_hash(t, ["a", "b"])[0] != canonical.content_hash(
        t, ["b", "a"]
    )[0]


def test_content_hash_falsy_forms_equal():
    """'' == 'None' == null under canonicalization (Diff.py:55-67 analog)."""
    t = pa.table({"a": ["", "None", None, "real"]})
    h = canonical.content_hash(t, ["a"], falsy_null_columns=["a"])
    assert h[0] == h[1] == h[2] != h[3]


def test_content_hash_deterministic_across_calls():
    t = pa.table({"a": ["p", "q"], "n": pa.array([1, 2], pa.int32())})
    assert (canonical.content_hash(t, ["a", "n"]) == canonical.content_hash(t, ["a", "n"])).all()


def test_pad_missing_columns():
    t = pa.table({"a": [1, 2]})
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    out = canonical.pad_missing_columns(t, schema)
    assert out.column("b").null_count == 2


def test_partition_ids_stable_and_bounded():
    t = pa.table({"k": [f"conv-{i:08d}" for i in range(1000)]})
    p1 = canonical.partition_ids(t, ["k"], 32)
    p2 = canonical.partition_ids(t, ["k"], 32)
    assert (p1 == p2).all()
    assert p1.min() >= 0 and p1.max() < 32
    # reasonably balanced: no partition > 3x the mean
    counts = np.bincount(p1, minlength=32)
    assert counts.max() < 3 * counts.mean()


def test_content_hash_of_sliced_batches_matches_full():
    """Ray map batches are zero-copy block slices; pyarrow-16's if_else
    corrupts some sliced string inputs (compacted buffer, un-rebased
    offsets). canonicalize compacts first — hashes of any slice must equal
    the corresponding rows of the full-table hash."""
    from bcdc2bcdc_ray import changegen as cg

    ev = cg.gen_change_events(50_000, 2_000, seed=43)
    full = canonical.content_hash(ev, ["role", "text", "tool", "ts"], ("text", "tool"))
    for off, ln in [(13_000, 24_000), (0, 10), (49_990, 10), (1, 49_999)]:
        hs = canonical.content_hash(
            ev.slice(off, ln), ["role", "text", "tool", "ts"], ("text", "tool")
        )
        assert (hs == full[off : off + ln]).all()


def test_hash_context_independent_with_nulls():
    """A value's hash must not depend on whether its batch happens to hold
    a null elsewhere in the column (a null-bearing int/temporal array
    converts to float64 via to_numpy, and reinterpreting those bits used
    to poison every row's hash in the array — surfaced by diff_lakes,
    whose delete rows null the ts payload)."""
    import pyarrow as pa

    from bcdc2bcdc_ray.canonical import _hash_one_column

    cases = [
        (pa.timestamp("us"), 1_767_237_427_000_000),
        (pa.int32(), 42),
        (pa.int64(), -7),
        (pa.uint32(), 42),
        (pa.float64(), 2.5),
        (pa.string(), "x"),
        (pa.bool_(), True),
    ]
    for t, v in cases:
        with_null = _hash_one_column(pa.array([v, None], t))[0]
        alone = _hash_one_column(pa.array([v], t))[0]
        assert with_null == alone, (t, hex(with_null), hex(alone))


def test_hash_all_null_long_string_array():
    """An ALL-null string array longer than the dictionary-encode threshold
    (1024) used to crash hash_string_array (empty dictionary → gather into
    an empty hash array) — reachable from partition_ids on any big batch
    whose string key column is entirely null (the null group of a secondary
    index, surfaced by view.fsck). All-null must hash to the same sentinel
    the mixed-null path produces, at every size."""
    import numpy as np
    import pyarrow as pa

    from bcdc2bcdc_ray.canonical import _hash_one_column

    small = _hash_one_column(pa.array([None, "x"], pa.string()))
    for n in (2000, 5000):
        h = _hash_one_column(pa.array([None] * n, pa.string()))
        assert len(h) == n
        assert (h == small[0]).all()  # same null sentinel as the mixed path
    # repeat-heavy null-bearing long array still matches the scalar path
    vals = (["a", None, "bb"] * 700)[:2000]
    big = _hash_one_column(pa.array(vals, pa.string()))
    one_by_one = np.array(
        [_hash_one_column(pa.array([v], pa.string()))[0] for v in ("a", None, "bb")],
        np.uint64,
    )
    lut = {"a": one_by_one[0], None: one_by_one[1], "bb": one_by_one[2]}
    assert (big == np.array([lut[v] for v in vals], np.uint64)).all()
