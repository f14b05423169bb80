"""Declarative table specification — the engine's schema system.

Generalizes the reference's JSON transformation config
(``/root/reference/bcdc2bcdc/CKANTransform.py:65-72`` ``TransformationConfig``;
config keys at ``/root/reference/bcdc2bcdc/constants.py:46-57``): per logical
table it declares the unique key, which columns participate in comparison
("user populated", cf. ``CKANTransform.py:169``), ignore lists, required
defaults, type-enforcement rules and custom per-stage transform hooks.

Unlike the reference (nested JSON records, config loaded into a module global
at ``CKANData.py:32``), a ``TableSpec`` binds to a flat-ish Arrow schema and is
a small picklable dataclass: it ships to every Ray worker inside the
actor-pool callables, loaded once per actor in ``__init__`` (stateful-stage
pattern, SURVEY §2.3 ST1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import pyarrow as pa

# Arrow schema of the transcripts lake table — the payload mandated by
# BASELINE.json `input_hint`.
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Change-event ("WAL tail") schema: transcripts columns + (lsn, op).
CHANGE_EVENT_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),  # "upsert" | "delete"
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


@dataclass(frozen=True)
class TableSpec:
    """Schema + merge semantics for one lake table.

    Mirrors, in declarative form, what the reference spreads across
    ``unique_id_field`` / ``user_populated_properties`` /
    ``ignore_list`` / ``required_default_values`` /
    ``data_type_enforcement`` (``/root/reference/bcdc2bcdc/constants.py:46-57``).
    """

    name: str
    schema: pa.Schema
    # merge key — the reference's unique_id_field (CKANTransform.py:208);
    # composite keys supported (transcripts: (conv_id, turn_idx)).
    key: tuple[str, ...]
    # columns hashed for change detection — the reference's
    # user_populated_properties filter (CKANData.py:173-263). None = all
    # non-key columns.
    compare_columns: Optional[tuple[str, ...]] = None
    # key values excluded from every add/delete/update — ignore_list
    # (CKANUpdate.py:85-117). Keyed on the FIRST key column (the reference
    # ignores whole objects, we ignore whole conversations).
    ignore_keys: frozenset = frozenset()
    # column -> default fill for nulls — required_default_values
    # (CKANData.py:1789-1885).
    defaults: dict = field(default_factory=dict)
    # string columns where '' and 'None' canonicalize to null before
    # hashing — both-falsy-equal (Diff.py:55-67) + fixNoneAsString
    # (CustomTransformers.py:153-170).
    falsy_null_columns: tuple[str, ...] = ()
    # per-stage vectorized hooks (batch: pa.Table -> pa.Table) — the custom
    # transformer registry analog (CustomTransformers.py:24-120) with the
    # UpdateType phase selector (constants.py:64-67) replaced by explicit
    # hook lists.
    on_compare: tuple[Callable, ...] = ()
    on_apply: tuple[Callable, ...] = ()
    # ADD-conflict policy (the reference's username-conflict retry-rename,
    # ``CKANUpdate.py:153-189``): a string column that must stay unique
    # within a partition's state. ADD rows colliding with existing rows (or
    # earlier ADDs) on this column are renamed — by ``on_add_conflict(value,
    # taken_set) -> new_value`` if given, else by numeric suffixing.
    # Partitioning assumption: uniqueness is enforced PER PARTITION (the
    # reference enforces per instance); co-locate by this column if global
    # uniqueness is required.
    add_conflict_column: Optional[str] = None
    on_add_conflict: Optional[Callable] = None

    def compare_cols(self) -> tuple[str, ...]:
        if self.compare_columns is not None:
            return self.compare_columns
        return tuple(n for n in self.schema.names if n not in self.key)


def transcripts_spec(ignore_keys: frozenset = frozenset()) -> TableSpec:
    """The flagship spec: transcripts lake keyed on (conv_id, turn_idx)."""
    return TableSpec(
        name="transcripts",
        schema=TRANSCRIPTS_SCHEMA,
        key=("conv_id", "turn_idx"),
        # ALL payload columns participate in comparison (ts is turn DATA, not
        # processing metadata — a true CDC echo re-sends the identical row).
        # This keeps the merge deterministic under any WAL chunk batching:
        # when the hash covers every applied column, classifying an event
        # NOOP vs UPDATE yields the same final state, so resume boundaries
        # can never change the output. The only caveat: canonically-equal but
        # raw-different payloads ('' vs 'None') resolve to "keep current
        # raw" — stable because real echoes are byte-identical.
        compare_columns=("role", "text", "tool", "ts"),
        ignore_keys=ignore_keys,
        falsy_null_columns=("text", "tool"),
    )
