"""Merge-time schema evolution: column add + type widening.

The Ray-native analog of the reference's ``data_type_enforcement`` coercion
(``/root/reference/bcdc2bcdc/CKANData.py:966-1022`` ``enforceTypes``) and its
missing-field→None padding (``/root/reference/bcdc2bcdc/CKANData.py:255-258``),
promoted to first-class lake semantics (SURVEY §7 step 6):

- a change batch may carry columns the lake lacks → the unified schema gains
  the column; existing lake rows pad with nulls;
- a change batch may carry a WIDER type for an existing column (int32→int64,
  float32→float64, timestamp s→us) → the lake column widens;
- narrowing is never applied: the unified type is the permissive promotion
  of both (``pa.unify_schemas(promote_options="permissive")``).

Pure pa.Table functions — run inside the merge writer per partition, so
evolution happens incrementally as evolved batches arrive; partitions not yet
touched keep their old file schema and ``read_lake`` unifies at scan time.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa


def unify(a: pa.Schema, b: pa.Schema) -> pa.Schema:
    """Permissive union of two schemas; field order = a's order then b's new
    columns (stable, so partition files stay column-aligned)."""
    return pa.unify_schemas([a, b], promote_options="permissive")


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast/pad a table to the unified schema: add missing columns as nulls,
    cast widened columns, order columns per schema."""
    n = table.num_rows
    cols = []
    for fld in schema:
        if fld.name in table.column_names:
            col = table.column(fld.name)
            if col.type != fld.type:
                col = col.cast(fld.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=fld.type))
    return pa.table(dict(zip(schema.names, cols)), schema=schema)


def unify_tables(tables: Sequence[pa.Table]) -> list[pa.Table]:
    """Conform a set of tables to their common permissive schema."""
    schema = tables[0].schema
    for t in tables[1:]:
        schema = unify(schema, t.schema)
    return [conform(t, schema) for t in tables]
