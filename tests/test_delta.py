"""Unit tests for the delta classifier (pure pa.Table, no Ray).

Mirrors the reference's delta tests
(/root/reference/tests/test_CKANData.py:74-105 getDelta invariants) on tiny
Arrow tables.
"""

import pyarrow as pa

from bcdc2bcdc_ray import changegen as cg
from bcdc2bcdc_ray.spec import transcripts_spec
from bcdc2bcdc_ray.stages import delta, evolve


def _lake():
    return pa.table(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": ["user", "assistant", "user"],
            "text": ["hello", "hi there", "bye"],
            "tool": [None, None, None],
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        }
    )


def _ev(lsn, op, conv, turn, text, role="user", ts=None):
    return {
        "lsn": lsn, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": role, "text": text, "tool": None,
        "ts": (100 + lsn) if ts is None else ts,
    }


def _events(rows):
    t = pa.Table.from_pylist(rows)
    return t.cast(
        pa.schema(
            [
                ("lsn", pa.int64()), ("op", pa.string()), ("conv_id", pa.string()),
                ("turn_idx", pa.int32()), ("role", pa.string()), ("text", pa.string()),
                ("tool", pa.string()), ("ts", pa.timestamp("us")),
            ]
        )
    )


def test_classify_add_update_delete_noop():
    spec = transcripts_spec()
    events = _events(
        [
            _ev(1, "upsert", "c3", 0, "new conv"),          # ADD
            _ev(2, "upsert", "c1", 0, "changed"),            # UPDATE
            _ev(3, "delete", "c2", 0, None),                 # DELETE
            _ev(4, "upsert", "c1", 1, "hi there", "assistant", ts=2),  # NOOP (echo)
            _ev(5, "delete", "c9", 7, None),                 # NOOP (absent key)
        ]
    )
    state, counts = delta.merge_partition(_lake(), events, spec)
    assert counts == {"adds": 1, "updates": 1, "deletes": 1, "noops": 2}
    keys = list(zip(state.column("conv_id").to_pylist(), state.column("turn_idx").to_pylist()))
    assert keys == [("c1", 0), ("c1", 1), ("c3", 0)]
    assert state.column("text").to_pylist() == ["changed", "hi there", "new conv"]


def test_lww_max_lsn_wins():
    spec = transcripts_spec()
    events = _events(
        [
            _ev(1, "upsert", "c1", 0, "v1"),
            _ev(3, "upsert", "c1", 0, "v3"),
            _ev(2, "delete", "c1", 0, None),
        ]
    )
    state, counts = delta.merge_partition(_lake(), events, spec)
    t = {(c, i): x for c, i, x in zip(
        state.column("conv_id").to_pylist(),
        state.column("turn_idx").to_pylist(),
        state.column("text").to_pylist())}
    assert t[("c1", 0)] == "v3"


def test_delete_wins_when_last():
    spec = transcripts_spec()
    events = _events(
        [_ev(1, "upsert", "c1", 0, "v1"), _ev(2, "delete", "c1", 0, None)]
    )
    state, counts = delta.merge_partition(_lake(), events, spec)
    assert ("c1", 0) not in set(
        zip(state.column("conv_id").to_pylist(), state.column("turn_idx").to_pylist())
    )
    assert counts["deletes"] == 1


def test_falsy_text_is_noop():
    """lake '' vs event 'None' → canonically equal → NOOP (M6/M10)."""
    spec = transcripts_spec()
    lake = _lake().set_column(3, "text", pa.array(["", "hi there", "bye"]))
    events = _events([_ev(1, "upsert", "c1", 0, "None", ts=1)])
    _, counts = delta.merge_partition(lake, events, spec)
    assert counts == {"adds": 0, "updates": 0, "deletes": 0, "noops": 1}


def test_ignore_keys_filtered():
    spec = transcripts_spec(ignore_keys=frozenset({"c1"}))
    events = _events(
        [_ev(1, "upsert", "c1", 0, "changed"), _ev(2, "upsert", "c2", 0, "changed2")]
    )
    state, counts = delta.merge_partition(_lake(), events, spec)
    assert counts["updates"] == 1
    t = {(c, i): x for c, i, x in zip(
        state.column("conv_id").to_pylist(),
        state.column("turn_idx").to_pylist(),
        state.column("text").to_pylist())}
    assert t[("c1", 0)] == "hello"          # untouched
    assert t[("c2", 0)] == "changed2"


def test_schema_evolution_column_add_and_widen():
    spec = transcripts_spec()
    events = _events([_ev(1, "upsert", "c1", 0, "changed")])
    events = events.set_column(
        events.column_names.index("turn_idx"),
        "turn_idx",
        events.column("turn_idx").cast(pa.int64()),
    ).append_column("lang", pa.array(["en"], pa.string()))
    state, counts = delta.merge_partition(_lake(), events, spec)
    assert state.schema.field("turn_idx").type == pa.int64()
    assert "lang" in state.schema.names
    langs = {c: l for c, l in zip(state.column("conv_id").to_pylist(), state.column("lang").to_pylist())}
    assert langs["c2"] is None  # padded null on untouched rows


def test_merge_matches_oracle_random():
    spec = transcripts_spec()
    lake = cg.gen_transcripts(80, seed=7)
    events = cg.gen_change_events(2000, 80, seed=8)
    state, _ = delta.merge_partition(lake, events, spec)
    assert state.equals(cg.oracle_replay(lake, events))


def test_reapply_is_all_noop():
    spec = transcripts_spec()
    lake = cg.gen_transcripts(40, seed=9)
    events = cg.gen_change_events(500, 40, seed=10)
    s1, _ = delta.merge_partition(lake, events, spec)
    s2, counts = delta.merge_partition(s1, events, spec)
    assert s2.equals(s1)
    assert counts["adds"] == counts["updates"] == counts["deletes"] == 0


# ---- property-based: arbitrary event streams vs the dict oracle -----------

from hypothesis import given, settings
from hypothesis import strategies as st

_op = st.sampled_from(["upsert", "delete"])
_conv = st.sampled_from(["c1", "c2", "hot"])
_turn = st.integers(min_value=0, max_value=3)
_text = st.one_of(
    st.none(), st.text(alphabet="abβ☃ ", min_size=0, max_size=6)
)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_op, _conv, _turn, _text), min_size=0, max_size=40))
def test_merge_matches_oracle_property(rows):
    """Any LSN-ordered event stream (unicode/empty/null texts, repeated
    keys, delete-then-upsert-then-delete chains) replays to the dict
    oracle's final state — and re-applying is a pure no-op."""
    spec = transcripts_spec()
    lake = _lake().cast(spec.schema)  # _lake()'s all-None tool infers null type
    ev_rows = [_ev(i + 1, op, c, t, txt) for i, (op, c, t, txt) in enumerate(rows)]
    if ev_rows:
        events = _events(ev_rows)
    else:
        events = _events([_ev(1, "upsert", "c1", 0, "x")]).slice(0, 0)
    state, _ = delta.merge_partition(lake, events, spec)
    assert state.equals(cg.oracle_replay(lake, events))
    state2, counts = delta.merge_partition(state, events, spec)
    assert state2.equals(state)
    assert counts["adds"] == counts["updates"] == counts["deletes"] == 0
