"""Unit tests for the M-family batch transforms (no Ray)."""

import pyarrow as pa

from bcdc2bcdc_ray.stages import transforms as tf


def _t(**cols):
    return pa.table(cols)


def test_project():
    out = tf.project(_t(a=[1], b=[2], c=[3]), ["a", "c", "zz"])
    assert out.column_names == ["a", "c"]


def test_fill_defaults():
    out = tf.fill_defaults(_t(a=pa.array([None, "x"])), {"a": "d"})
    assert out.column("a").to_pylist() == ["d", "x"]


def test_enforce_types_widen():
    out = tf.enforce_types(
        _t(a=pa.array([1, 2], pa.int32())), pa.schema([("a", pa.int64())])
    )
    assert out.schema.field("a").type == pa.int64()


def test_value_map():
    out = tf.value_map(_t(a=["x", "y", None]), "a", {"x": "X"})
    assert out.column("a").to_pylist() == ["X", "y", None]


def test_value_map_with_default():
    out = tf.value_map(_t(a=["x", "y"]), "a", {"x": "X"}, default="other")
    assert out.column("a").to_pylist() == ["X", "other"]


def test_domain_clamp():
    out = tf.domain_clamp(_t(a=["en", "xx", None]), "a", ("en", "fr"), "other")
    assert out.column("a").to_pylist() == ["en", "other", "other"]


def test_conditional_set():
    out = tf.conditional_set(
        _t(s=["arch", "live"], d=pa.array([None, None], pa.string())),
        "s", "arch", "d", "2222-02-02",
    )
    assert out.column("d").to_pylist() == ["2222-02-02", None]


def test_str_to_bool():
    out = tf.str_to_bool(_t(a=["true", "False", None]), "a")
    assert out.column("a").to_pylist() == [True, False, None]


def test_replace_substring():
    out = tf.replace_substring(_t(a=["http://old/x"]), "a", "old", "new")
    assert out.column("a").to_pylist() == ["http://new/x"]


def test_strip_whitespace():
    out = tf.strip_whitespace(_t(a=["  x "]), "a")
    assert out.column("a").to_pylist() == ["x"]


def test_json_extract_field():
    out = tf.json_extract_field(
        _t(p=['{"k": 1}', '{"z": 2}', None, "junk"]), "p", "k", "kv"
    )
    assert out.column("kv").to_pylist() == ["1", None, None, None]


def test_canonical_json():
    out = tf.canonical_json(_t(p=['{"b": 1, "a": 2}', None]), "p")
    assert out.column("p").to_pylist() == ['{"a":2,"b":1}', None]


def _nested():
    st = pa.array(
        [
            [{"id": 1, "lang": "en"}, {"id": 2, "lang": "zh"}, {"id": 3, "lang": "fr"}],
            [],
            None,
            [{"id": 4, "lang": "zh"}],
            [{"id": 5, "lang": "en"}, {"id": 6, "lang": None}],
        ],
        type=pa.list_(pa.struct([("id", pa.int64()), ("lang", pa.string())])),
    )
    return pa.table({"k": [10, 20, 30, 40, 50], "docs": st})


def test_scrub_list_struct():
    out = tf.scrub_list_struct(_nested(), "docs", "lang", ["zh"])
    docs = out.column("docs").to_pylist()
    assert [d["id"] for d in docs[0]] == [1, 3]
    assert docs[1] == []
    assert docs[2] is None  # null list preserved
    assert docs[3] == []  # all elements scrubbed
    assert [d["id"] for d in docs[4]] == [5, 6]  # null field never matches


def test_remap_list_struct():
    out = tf.remap_list_struct(_nested(), "docs", "lang", {"en": "en-US"})
    docs = out.column("docs").to_pylist()
    assert [d["lang"] for d in docs[0]] == ["en-US", "zh", "fr"]
    assert docs[2] is None
    assert [d["lang"] for d in docs[4]] == ["en-US", None]
    # other struct fields untouched
    assert [d["id"] for d in docs[0]] == [1, 2, 3]


def test_remap_list_struct_with_default():
    out = tf.remap_list_struct(_nested(), "docs", "lang", {"en": "E"}, default="other")
    docs = out.column("docs").to_pylist()
    assert [d["lang"] for d in docs[0]] == ["E", "other", "other"]


def test_word_match_clamp():
    import pyarrow as pa

    from bcdc2bcdc_ray.stages import transforms

    b = pa.table(
        {
            "v": pa.array(
                ["big merge day", "spark and merge", "nothing here", None, "windowless"],
                pa.string(),
            )
        }
    )
    out = transforms.word_match_clamp(b, "v", ("spark", "merge", "window"), "other", "hit")
    # first-in-domain-order priority; whole-word only; null -> default
    assert out.column("hit").to_pylist() == ["merge", "spark", "other", "other", "other"]
