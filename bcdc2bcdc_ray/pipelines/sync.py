"""Multi-table FK-ordered sync orchestration.

Re-expresses the reference's top-level run sequencing — users → groups →
organizations → packages in strict dependency order
(``/root/reference/bcdc2bcdc/bin/runBCDC2BCDC.py:286-289``) with lookup
tables registered from FETCHED data as each type completes
(``/root/reference/bcdc2bcdc/DataCache.py:143-189`` ``addData``) and
consumed by later types' remaps (SURVEY §3.1).

Here each table is a full CDC replay; LUTs are built from the upstream
table's POST-MERGE lake state and injected into downstream specs as
``on_compare`` remap hooks.

Scale contract: an exported LUT is materialized driver-side and broadcast
into the downstream replay's workers — it must be DIMENSION-sized (the
same assumption as every broadcast join in this repo). Fact-sized remaps
belong in a bucketed join stage, not a LUT.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

from ..spec import TableSpec
from ..stages import transforms
from . import cdc


@dataclass
class SyncTable:
    """One table in the sync DAG."""

    spec: TableSpec
    lake_dir: str
    wal_paths: list
    # names of SyncTable specs that must merge BEFORE this one
    depends_on: tuple = ()
    # LUTs published from this table's post-merge lake state:
    # {lut_name: (key_column, value_column)}
    exports: dict = field(default_factory=dict)
    # column remaps consuming upstream LUTs: {column: lut_name}
    imports: dict = field(default_factory=dict)
    # replay kwargs for this table only (salt, audit_dir, ...)
    replay_kwargs: dict = field(default_factory=dict)


def _toposort(tables: list[SyncTable]) -> list[SyncTable]:
    by_name = {t.spec.name: t for t in tables}
    for t in tables:
        for dep in t.depends_on:
            if dep not in by_name:
                raise ValueError(f"{t.spec.name} depends on unknown table {dep!r}")
    done: list[SyncTable] = []
    done_names: set = set()
    pending = list(tables)
    while pending:
        ready = [t for t in pending if set(t.depends_on) <= done_names]
        if not ready:
            cycle = ", ".join(t.spec.name for t in pending)
            raise ValueError(f"dependency cycle among: {cycle}")
        # deterministic order among ready tables: declaration order
        for t in ready:
            done.append(t)
            done_names.add(t.spec.name)
        pending = [t for t in pending if t.spec.name not in done_names]
    return done


def _lut_hook(column: str, mapping: dict):
    def hook(batch):
        return transforms.value_map(batch, column, mapping)

    return hook


def run_sync(tables: list[SyncTable], **common_replay_kwargs) -> dict:
    """Replay every table in dependency order, threading derived LUTs from
    upstream post-merge state into downstream remap hooks. Returns
    ``{"order": [...], "reports": {name: replay_report},
    "luts": {lut_name: size}}``.

    A table with both an export and downstream importers is the reference's
    exact two-pass shape: merge the dim, READ BACK its final state, remap
    the fact through it — never through the dim's pre-merge input."""
    order = _toposort(tables)
    luts: dict = {}
    reports: dict = {}
    for t in order:
        spec = t.spec
        if t.imports:
            missing = [n for n in t.imports.values() if n not in luts]
            if missing:
                raise ValueError(
                    f"{spec.name} imports {missing} but no upstream exported them"
                    " — check depends_on"
                )
            hooks = tuple(
                _lut_hook(col, luts[name]) for col, name in t.imports.items()
            )
            spec = dataclasses.replace(spec, on_compare=spec.on_compare + hooks)
        kw = dict(common_replay_kwargs)
        kw.update(t.replay_kwargs)
        reports[spec.name] = cdc.replay(t.lake_dir, t.wal_paths, spec, **kw)
        for lut_name, (kc, vc) in t.exports.items():
            state = cdc.read_lake_table(t.lake_dir)
            luts[lut_name] = dict(
                zip(state.column(kc).to_pylist(), state.column(vc).to_pylist())
            )
    return {
        "order": [t.spec.name for t in order],
        "reports": reports,
        "luts": {k: len(v) for k, v in luts.items()},
    }
