"""FK-ordered multi-table sync orchestration (pipelines/sync.py): topo
ordering, derived-LUT threading through a 3-level chain, and the error
surface (unknown dep, cycle, missing exporter)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bcdc2bcdc_ray import changegen as cg
from bcdc2bcdc_ray.pipelines import cdc, sync
from bcdc2bcdc_ray.spec import TableSpec


def _wal_chunks(tbl: pa.Table, out_dir: str, n: int = 2) -> list:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    rows = tbl.num_rows
    per = max(1, rows // n)
    for i in range(0, rows, per):
        p = os.path.join(out_dir, f"wal-{i:05d}.parquet")
        pq.write_table(tbl.slice(i, per), p)
        paths.append(p)
    return paths


ALIAS_SCHEMA = pa.schema(
    [("alias_id", pa.string()), ("tool", pa.string()), ("ts", pa.timestamp("us"))]
)
CONV_SCHEMA = pa.schema(
    [("cid", pa.string()), ("alias", pa.string()), ("ts", pa.timestamp("us"))]
)

_TS = pa.array([0] * 4, pa.timestamp("us"))


def _three_table_chain(tmp_path):
    # A: tools dim (the reference's 'users') — exports tool_id → dest_name
    dim_spec = TableSpec(
        name="tools",
        schema=cg.TOOLS_SCHEMA,
        key=("tool_id",),
        compare_columns=("dest_name", "ts"),
    )
    dim_dir = str(tmp_path / "tools_lake")
    cdc.init_lake(cg.gen_tool_dim(), dim_dir, dim_spec, num_partitions=2)
    dim_wal = _wal_chunks(cg.gen_tool_events(32), str(tmp_path / "tools_wal"))

    # B: aliases — its WAL carries raw tool_ids, remapped through A's LUT
    alias_spec = TableSpec(
        name="aliases",
        schema=ALIAS_SCHEMA,
        key=("alias_id",),
        compare_columns=("tool", "ts"),
    )
    tools = cg.gen_tool_dim().column("tool_id").to_pylist()
    aliases = [f"al{i}" for i in range(4)]
    alias_lake = pa.table(
        {
            "alias_id": pa.array(aliases, pa.string()),
            "tool": pa.array(["unset"] * 4, pa.string()),
            "ts": _TS,
        }
    )
    alias_dir = str(tmp_path / "alias_lake")
    cdc.init_lake(alias_lake, alias_dir, alias_spec, num_partitions=2)
    alias_events = pa.table(
        {
            "lsn": pa.array(range(1, 5), pa.int64()),
            "op": pa.array(["upsert"] * 4, pa.string()),
            "alias_id": pa.array(aliases, pa.string()),
            "tool": pa.array([tools[i % len(tools)] for i in range(4)], pa.string()),
            "ts": _TS,
        }
    )
    alias_wal = _wal_chunks(alias_events, str(tmp_path / "alias_wal"))

    # C: convs — its WAL carries alias_ids, remapped through B's POST-MERGE
    # state (two-pass: depends on B's final tool names, which depend on A)
    conv_spec = TableSpec(
        name="convs",
        schema=CONV_SCHEMA,
        key=("cid",),
        compare_columns=("alias", "ts"),
    )
    conv_lake = pa.table(
        {
            "cid": pa.array([f"c{i}" for i in range(4)], pa.string()),
            "alias": pa.array(["unset"] * 4, pa.string()),
            "ts": _TS,
        }
    )
    conv_dir = str(tmp_path / "conv_lake")
    cdc.init_lake(conv_lake, conv_dir, conv_spec, num_partitions=2)
    conv_events = pa.table(
        {
            "lsn": pa.array(range(1, 5), pa.int64()),
            "op": pa.array(["upsert"] * 4, pa.string()),
            "cid": pa.array([f"c{i}" for i in range(4)], pa.string()),
            "alias": pa.array(aliases, pa.string()),
            "ts": _TS,
        }
    )
    conv_wal = _wal_chunks(conv_events, str(tmp_path / "conv_wal"))

    # declared deliberately out of order — topo must fix it
    return [
        sync.SyncTable(
            spec=conv_spec,
            lake_dir=conv_dir,
            wal_paths=conv_wal,
            depends_on=("aliases",),
            imports={"alias": "alias_tool"},
        ),
        sync.SyncTable(
            spec=alias_spec,
            lake_dir=alias_dir,
            wal_paths=alias_wal,
            depends_on=("tools",),
            imports={"tool": "tool_names"},
            exports={"alias_tool": ("alias_id", "tool")},
        ),
        sync.SyncTable(
            spec=dim_spec,
            lake_dir=dim_dir,
            wal_paths=dim_wal,
            exports={"tool_names": ("tool_id", "dest_name")},
        ),
    ]


def test_three_level_chain_threads_derived_luts(ray_session, tmp_path):
    tables = _three_table_chain(tmp_path)
    res = sync.run_sync(tables)
    assert res["order"] == ["tools", "aliases", "convs"]
    n_tools = len(cg.gen_tool_dim())
    assert res["luts"] == {"tool_names": n_tools, "alias_tool": 4}

    lut_a = cg.final_tool_lut(cg.gen_tool_dim(), cg.gen_tool_events(32))
    tools = cg.gen_tool_dim().column("tool_id").to_pylist()

    # B's final tool column is A's POST-merge dest names, not raw tool_ids
    b_state = cdc.read_lake_table(tables[1].lake_dir)
    b_map = dict(
        zip(b_state.column("alias_id").to_pylist(), b_state.column("tool").to_pylist())
    )
    exp_b = {f"al{i}": lut_a[tools[i % len(tools)]] for i in range(4)}
    assert b_map == exp_b

    # C's final alias column went through B's post-merge state
    c_state = cdc.read_lake_table(tables[0].lake_dir)
    c_map = dict(
        zip(c_state.column("cid").to_pylist(), c_state.column("alias").to_pylist())
    )
    assert c_map == {f"c{i}": exp_b[f"al{i}"] for i in range(4)}


def test_sync_error_surface(ray_session, tmp_path):
    spec = TableSpec(name="x", schema=CONV_SCHEMA, key=("cid",))
    t = sync.SyncTable(spec=spec, lake_dir="/tmp/none", wal_paths=[],
                       depends_on=("ghost",))
    with pytest.raises(ValueError, match="unknown table"):
        sync.run_sync([t])

    a = sync.SyncTable(
        spec=TableSpec(name="a", schema=CONV_SCHEMA, key=("cid",)),
        lake_dir="/tmp/none", wal_paths=[], depends_on=("b",),
    )
    b = sync.SyncTable(
        spec=TableSpec(name="b", schema=CONV_SCHEMA, key=("cid",)),
        lake_dir="/tmp/none", wal_paths=[], depends_on=("a",),
    )
    with pytest.raises(ValueError, match="cycle"):
        sync.run_sync([a, b])


def test_sync_import_without_exporter_raises(ray_session, tmp_path):
    spec = TableSpec(
        name="solo",
        schema=CONV_SCHEMA,
        key=("cid",),
        compare_columns=("alias", "ts"),
    )
    lake = pa.table(
        {
            "cid": pa.array(["c0"], pa.string()),
            "alias": pa.array(["x"], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    d = str(tmp_path / "solo")
    cdc.init_lake(lake, d, spec, num_partitions=1)
    t = sync.SyncTable(
        spec=spec, lake_dir=d, wal_paths=[], imports={"alias": "nope"}
    )
    with pytest.raises(ValueError, match="no upstream exported"):
        sync.run_sync([t])


def test_sync_emits_feeds_that_maintain_views(ray_session, tmp_path):
    """Composition: a multi-table sync with per-table ``replay_kwargs``
    emitting pre-image change feeds, each feeding its own incremental
    view — both views land on a recompute of their post-sync lakes."""
    from bcdc2bcdc_ray.pipelines import view
    from bcdc2bcdc_ray.spec import transcripts_spec

    spec = transcripts_spec()
    lake0 = cg.gen_transcripts(60, seed=9)
    lake_dir = str(tmp_path / "tr_lake")
    cdc.init_lake(lake0, lake_dir, spec, num_partitions=4)
    ch = str(tmp_path / "tr_changes")
    ev = cg.gen_change_events(1500, 60, seed=10)
    wal = cg.write_wal_chunks(ev, str(tmp_path / "tr_wal"), num_chunks=3)

    dim_spec = TableSpec(
        name="tools",
        schema=cg.TOOLS_SCHEMA,
        key=("tool_id",),
        compare_columns=("dest_name", "ts"),
    )
    dim_dir = str(tmp_path / "tools_lake")
    cdc.init_lake(cg.gen_tool_dim(), dim_dir, dim_spec, num_partitions=2)
    dim_wal = _wal_chunks(cg.gen_tool_events(32), str(tmp_path / "tools_wal"))
    dim_ch = str(tmp_path / "tools_changes")

    vdir = str(tmp_path / "tr_view")
    view.create_view(
        vdir, lake_dir, ["conv_id"],
        [view.AggSpec("n_rows", "count"), view.AggSpec("n_chars", "sum_len", "text")],
    )
    dim_vdir = str(tmp_path / "tools_view")
    view.create_view(
        dim_vdir, dim_dir, ["dest_name"], [view.AggSpec("n_rows", "count")]
    )

    sync.run_sync(
        [
            sync.SyncTable(
                spec=dim_spec, lake_dir=dim_dir, wal_paths=dim_wal,
                replay_kwargs={"changes_dir": dim_ch, "changes_before": True},
            ),
            sync.SyncTable(
                spec=spec, lake_dir=lake_dir, wal_paths=wal,
                depends_on=("tools",),
                replay_kwargs={"changes_dir": ch, "changes_before": True},
            ),
        ]
    )
    assert view.refresh_view(vdir, ch)["applied_rows"] > 0
    assert view.refresh_view(dim_vdir, dim_ch)["applied_rows"] > 0

    df = cdc.read_lake_table(lake_dir).to_pandas()
    df["n_chars"] = df.text.str.len().fillna(0).astype("int64")
    g = df.groupby("conv_id").agg(
        n_rows=("conv_id", "size"), n_chars=("n_chars", "sum")
    ).reset_index()
    expect = pa.table(
        {
            "conv_id": pa.array(g.conv_id, pa.string()),
            "n_rows": pa.array(g.n_rows, pa.int64()),
            "n_chars": pa.array(g.n_chars, pa.int64()),
        }
    ).sort_by([("conv_id", "ascending")])
    assert view.read_view(vdir).equals(expect)

    dd = cdc.read_lake_table(dim_dir).to_pandas()
    dg = dd.groupby("dest_name").agg(n_rows=("dest_name", "size")).reset_index()
    dim_expect = pa.table(
        {
            "dest_name": pa.array(dg.dest_name, pa.string()),
            "n_rows": pa.array(dg.n_rows, pa.int64()),
        }
    ).sort_by([("dest_name", "ascending")])
    assert view.read_view(dim_vdir).equals(dim_expect)
