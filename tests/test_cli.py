"""`python -m bcdc2bcdc_ray` job entry point — the Ray-native analog of the
reference's main binary (bin/runBCDC2BCDC.py:231-279): full lifecycle
(init-lake → replay with a declarative --spec config file → exactly-once
rerun → maintain → query → demo) driven through the CLI surface, in-process
under the session Ray fixture (main() only tears down a session it owns).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bcdc2bcdc_ray import changegen as cg
from bcdc2bcdc_ray.__main__ import main
from bcdc2bcdc_ray.pipelines import cdc
from tests.test_config import TRANSCRIPTS_CONFIG


def _run(capsys, *argv) -> dict:
    assert main(list(argv)) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


@pytest.fixture()
def workdir(tmp_path):
    lake = cg.gen_transcripts(120, seed=42)
    seed_path = tmp_path / "seed.parquet"
    pq.write_table(lake, seed_path)
    ev = cg.gen_change_events(4000, 120, seed=43)
    wal_paths = cg.write_wal_chunks(ev, str(tmp_path / "wal"), num_chunks=5)
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(TRANSCRIPTS_CONFIG))
    return {
        "tmp": tmp_path,
        "lake_table": lake,
        "events": ev,
        "seed": str(seed_path),
        "wal": wal_paths,
        "spec": str(spec_path),
        "lake": str(tmp_path / "lake"),
    }


def test_cli_lifecycle_init_replay_maintain(capsys, workdir):
    rep = _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    assert rep == {"cmd": "init-lake", "rows": workdir["lake_table"].num_rows,
                   "partitions": 8}

    rep = _run(
        capsys, "replay",
        "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"],
    )
    assert rep["cmd"] == "replay" and rep["adds"] > 0
    assert cdc.read_lake_table(workdir["lake"]).equals(
        cg.oracle_replay(workdir["lake_table"], workdir["events"])
    )

    # exactly-once through the CLI
    rep2 = _run(
        capsys, "replay",
        "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"],
    )
    assert rep2["adds"] + rep2["updates"] + rep2["deletes"] == 0

    rep3 = _run(capsys, "maintain", "split", "--lake", workdir["lake"])
    assert rep3["num_partitions"] == 16
    assert cdc.read_lake_table(workdir["lake"]).equals(
        cg.oracle_replay(workdir["lake_table"], workdir["events"])
    )


def test_cli_dry_run_writes_nothing(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--partitions", "4",
    )
    before = cdc.read_lake_table(workdir["lake"])
    rep = _run(
        capsys, "replay", "--dry-run",
        "--lake", workdir["lake"], "--wal", *workdir["wal"],
    )
    assert rep["adds"] > 0  # the what-would-change report
    assert cdc.read_lake_table(workdir["lake"]).equals(before)


def test_cli_query_and_listing(capsys, tmp_path):
    listing = _run(capsys, "list-queries")
    names = {q["name"] for q in listing["queries"]}
    assert listing["count"] >= 96 and "transcripts_replay" in names
    out = str(tmp_path / "out.parquet")
    rep = _run(
        capsys, "query", "--name", "multimodal_checksum",
        "--sf-dir", "/root/testdata/sf0.001", "--out", out,
    )
    assert rep["rows"] == 128
    assert pq.read_table(out).num_rows == 128


def test_cli_demo_verifies_oracle_and_exactly_once(capsys):
    rep = _run(capsys, "demo", "--convs", "80", "--events", "3000")
    assert rep["oracle_match"] is True and rep["exactly_once_rerun"] is True
    assert rep["view_match"] is True  # feed → maintained view == recompute


def test_cli_follow_drains_wal_dir(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "4",
    )
    rep = _run(
        capsys, "follow",
        "--lake", workdir["lake"], "--wal-dir", str(workdir["tmp"] / "wal"),
        "--spec", workdir["spec"], "--max-rounds", "5",
    )
    assert rep["cmd"] == "follow" and rep["adds"] > 0
    assert cdc.read_lake_table(workdir["lake"]).equals(
        cg.oracle_replay(workdir["lake_table"], workdir["events"])
    )


def test_cli_init_lake_streaming(capsys, workdir):
    rep = _run(
        capsys, "init-lake", "--streaming",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    assert rep["streaming"] is True
    assert rep["rows"] == workdir["lake_table"].num_rows
    rep2 = _run(
        capsys, "replay",
        "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"],
    )
    assert rep2["adds"] > 0
    assert cdc.read_lake_table(workdir["lake"]).equals(
        cg.oracle_replay(workdir["lake_table"], workdir["events"])
    )


def test_cli_stats_and_lookup(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    _run(
        capsys, "replay",
        "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"],
    )
    full = cdc.read_lake_table(workdir["lake"])

    # stats: footer-only rollup agrees with the actual lake contents
    rep = _run(capsys, "stats", "--lake", workdir["lake"])
    assert rep["rows"] == full.num_rows
    assert rep["files"] == rep["num_partitions"] == 8
    # per-partition watermarks may lag the global (a partition's watermark
    # is the max LSN routed to it), never exceed it
    assert rep["watermark_min"] <= rep["watermark_max"] == rep["global_watermark"]
    assert rep["counters"]["adds"] > 0

    # lookup: one-file point read equals the driver-side filter of the lake
    key = full.column("conv_id")[0].as_py()
    rep = _run(capsys, "lookup", "--lake", workdir["lake"], "--key", key)
    import pyarrow.compute as pc

    expect = full.filter(pc.equal(full.column("conv_id"), key))
    assert rep["rows"] == expect.num_rows > 0
    got = cdc.lookup(workdir["lake"], key).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert got.equals(expect)

    # lookup of an absent key is empty, still one-file
    rep = _run(capsys, "lookup", "--lake", workdir["lake"], "--key", "conv-zz")
    assert rep["rows"] == 0


def test_cli_view_lifecycle(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    view_dir = str(workdir["tmp"] / "view")
    changes = str(workdir["tmp"] / "changes")
    rep = _run(
        capsys, "create-view",
        "--view", view_dir, "--lake", workdir["lake"],
        "--group-by", "conv_id", "--agg", "n_chars:sum_len:text",
    )
    assert rep["view_rows"] > 0
    _run(
        capsys, "replay",
        "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"],
        "--changes-dir", changes, "--changes-before",
    )
    rep = _run(capsys, "refresh-view", "--view", view_dir, "--changes-dir", changes)
    assert rep["files"] > 0 and rep["applied_rows"] > 0
    rep = _run(capsys, "view-fsck", "--view", view_dir)
    assert rep["clean"] is True and rep["rows"] > 0

    # the maintained view equals a recompute over the replayed lake
    import pyarrow as pa
    from bcdc2bcdc_ray.pipelines import view as vw

    final = cg.oracle_replay(workdir["lake_table"], workdir["events"]).to_pandas()
    final["n_chars"] = final.text.str.len().fillna(0).astype("int64")
    g = final.groupby("conv_id").agg(
        n_rows=("conv_id", "size"), n_chars=("n_chars", "sum")
    ).reset_index()
    expect = pa.table(
        {
            "conv_id": pa.array(g.conv_id, pa.string()),
            "n_rows": pa.array(g.n_rows, pa.int64()),
            "n_chars": pa.array(g.n_chars, pa.int64()),
        }
    ).sort_by([("conv_id", "ascending")])
    assert vw.read_view(view_dir).equals(expect)


def test_cli_snapshot_restore(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "4",
    )
    before = cdc.read_lake_table(workdir["lake"])
    rep = _run(capsys, "snapshot", "--lake", workdir["lake"], "--tag", "seed")
    assert rep["files"] == 4
    _run(
        capsys, "replay",
        "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"],
    )
    assert not cdc.read_lake_table(workdir["lake"]).equals(before)
    rep = _run(capsys, "snapshot", "--lake", workdir["lake"], "--list")
    assert rep["snapshots"] == ["seed"]
    _run(capsys, "restore", "--lake", workdir["lake"], "--tag", "seed")
    assert cdc.read_lake_table(workdir["lake"]).equals(before)


def test_cli_view_lag_and_prune(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "4",
    )
    view_dir = str(workdir["tmp"] / "view")
    changes = str(workdir["tmp"] / "changes")
    _run(
        capsys, "create-view", "--view", view_dir, "--lake", workdir["lake"],
        "--group-by", "conv_id", "--agg", "n_chars:sum_len:text",
    )
    _run(
        capsys, "replay",
        "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"], "--changes-dir", changes, "--changes-before",
    )
    lag = _run(capsys, "view-lag", "--view", view_dir, "--changes-dir", changes)
    assert lag["files"] > 0 and lag["rows"] > 0
    # nothing consumed yet → nothing prunable under this view's cursor
    rep = _run(capsys, "prune-changes", "--changes-dir", changes, "--view", view_dir)
    assert rep["removed"] == 0 and rep["kept"] == lag["files"]
    _run(capsys, "refresh-view", "--view", view_dir, "--changes-dir", changes)
    rep = _run(capsys, "prune-changes", "--changes-dir", changes, "--view", view_dir)
    assert rep["removed"] == lag["files"] and rep["kept"] == 0
    lag = _run(capsys, "view-lag", "--view", view_dir, "--changes-dir", changes)
    assert lag == {"cmd": "view-lag", "files": 0, "rows": 0}


def test_cli_add_aggregate(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "4",
    )
    view_dir = str(workdir["tmp"] / "view")
    _run(
        capsys, "create-view", "--view", view_dir, "--lake", workdir["lake"],
        "--group-by", "conv_id", "--agg", "n_chars:sum_len:text",
    )
    rep = _run(
        capsys, "add-aggregate", "--view", view_dir, "--agg", "max_turn:max:turn_idx",
    )
    assert rep["added"] == "max_turn"
    from bcdc2bcdc_ray.pipelines import view as vw

    got = vw.read_view(view_dir)
    assert "max_turn" in got.column_names and got.num_rows > 0


def test_cli_diff_converges_lakes(capsys, workdir, tmp_path):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "4",
    )
    src = str(tmp_path / "srclake")
    import pyarrow.parquet as _pq

    final = cg.oracle_replay(workdir["lake_table"], workdir["events"])
    seed2 = str(tmp_path / "src_seed.parquet")
    _pq.write_table(final, seed2)
    _run(
        capsys, "init-lake", "--input", seed2, "--lake", src,
        "--spec", workdir["spec"], "--partitions", "4",
    )
    out = str(tmp_path / "diffwal")
    rep = _run(
        capsys, "diff", "--dst", workdir["lake"], "--src", src, "--out", out,
        "--spec", workdir["spec"],
    )
    assert rep["events"] > 0
    import os as _os

    chunks = sorted(
        _os.path.join(out, f) for f in _os.listdir(out) if f.endswith(".parquet")
    )
    _run(
        capsys, "replay", "--lake", workdir["lake"], "--wal", *chunks,
        "--spec", workdir["spec"],
    )
    assert cdc.read_lake_table(workdir["lake"]).equals(final)


def test_cli_delete_and_update_where(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    import pyarrow.compute as pc

    lake = workdir["lake_table"]
    # typed predicate parsing: ISO timestamp cutoff
    rep = _run(
        capsys, "delete-where", workdir["lake"],
        "--where", "ts:<:2026-01-04T00:00:00", "--spec", workdir["spec"],
    )
    n_old = int(
        pc.sum(
            pc.cast(
                pc.less(lake.column("ts"), __import__("datetime").datetime(2026, 1, 4)),
                pa.int64(),
            )
        ).as_py()
    )
    assert rep["matched"] == n_old > 0
    assert rep["replay"]["deletes"] == n_old
    assert cdc.read_lake_table(workdir["lake"]).num_rows == lake.num_rows - n_old

    rep = _run(
        capsys, "update-where", workdir["lake"],
        "--where", "role:==:tool", "--set", "tool=quarantined",
        "--spec", workdir["spec"],
    )
    assert rep["matched"] == rep["replay"]["updates"] > 0
    t = cdc.read_lake_table(workdir["lake"])
    tools = t.filter(pc.equal(t.column("role"), "tool")).column("tool")
    assert pc.all(pc.equal(tools, "quarantined")).as_py()

    # plan-only: --no-apply requires --out, writes WAL, mutates nothing
    n_before = t.num_rows
    out = str(workdir["tmp"] / "plan")
    rep = _run(
        capsys, "delete-where", workdir["lake"],
        "--where", "role:==:user", "--no-apply", "--out", out,
        "--spec", workdir["spec"],
    )
    assert rep["matched"] > 0 and "replay" not in rep
    assert cdc.read_lake_table(workdir["lake"]).num_rows == n_before


def test_cli_index_lifecycle(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    idx = str(workdir["tmp"] / "idx")
    rep = _run(capsys, "create-index", idx, "--lake", workdir["lake"], "--col", "tool")
    assert rep["cmd"] == "create-index" and rep["view_rows"] > 0

    # replay with a pre-image feed, refresh the index, probe through it
    feed = str(workdir["tmp"] / "feed")
    _run(
        capsys, "replay", "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"], "--changes-dir", feed, "--changes-before",
    )
    _run(capsys, "refresh-view", "--view", idx, "--changes-dir", feed)

    import pyarrow.compute as pc

    final = cdc.read_lake_table(workdir["lake"])
    tools = pc.unique(
        final.filter(pc.is_valid(final.column("tool"))).column("tool")
    )
    probe = tools[0].as_py()
    want = final.filter(pc.equal(final.column("tool"), probe)).num_rows
    rep = _run(capsys, "lookup-by", workdir["lake"], "--index", idx, "--value", probe)
    assert rep["rows"] == want > 0
    rep = _run(capsys, "view-lookup", idx, "--value", probe)
    assert rep["rows"] == want  # one index group per (tool, conv, turn) row


def test_cli_denorm_lifecycle(capsys, workdir):
    """create-denorm → fact replay with feed → refresh-denorm tracks the
    LEFT JOIN of current lake states (the CLI face of pipelines/denorm.py)."""
    import pyarrow.compute as pc

    from bcdc2bcdc_ray.pipelines import denorm
    from bcdc2bcdc_ray.spec import TableSpec

    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    dim_dir = str(workdir["tmp"] / "dim")
    dim_spec = TableSpec(
        name="tools", schema=cg.gen_tool_dim().schema, key=("tool_id",)
    )
    cdc.init_lake(cg.gen_tool_dim(), dim_dir, dim_spec, num_partitions=4)

    idx = str(workdir["tmp"] / "idx")
    _run(capsys, "create-index", idx, "--lake", workdir["lake"], "--col", "tool")

    dn = str(workdir["tmp"] / "dn")
    fch = str(workdir["tmp"] / "fch")
    dch = str(workdir["tmp"] / "dch")
    rep = _run(
        capsys, "create-denorm", dn,
        "--fact", workdir["lake"], "--dim", dim_dir, "--fk", "tool",
        "--select", "tool_dest=dest_name", "--index", idx,
        "--fact-changes", fch, "--dim-changes", dch,
    )
    assert rep["cmd"] == "create-denorm" and rep["rows"] > 0

    _run(
        capsys, "replay", "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"], "--changes-dir", fch, "--changes-before",
    )
    rep = _run(capsys, "refresh-denorm", dn)
    assert rep["cmd"] == "refresh-denorm" and rep["events"] > 0

    got = denorm.read_denorm(dn).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    fact = cdc.read_lake_table(workdir["lake"])
    dim = (
        cdc.read_lake_table(dim_dir)
        .select(["tool_id", "dest_name"])
        .rename_columns(["tool_id", "tool_dest"])
    )
    want = fact.join(
        dim, keys=["tool"], right_keys=["tool_id"], join_type="left outer"
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.select(want.column_names).equals(want)

    # idle refresh is a no-op through the CLI too
    rep = _run(capsys, "refresh-denorm", dn)
    assert rep["files"] == 0


def test_cli_snapshot_time_travel_and_denorm_lag(capsys, workdir):
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    _run(capsys, "snapshot", "--lake", workdir["lake"], "--tag", "t0")
    _run(
        capsys, "replay", "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"],
    )
    pre_rows = workdir["lake_table"].num_rows
    rep = _run(capsys, "read-snapshot", "--lake", workdir["lake"], "--tag", "t0")
    assert rep["stats"]["rows"] == pre_rows  # historical, not live
    conv = workdir["lake_table"].column("conv_id")[0].as_py()
    rep = _run(
        capsys, "read-snapshot", "--lake", workdir["lake"], "--tag", "t0",
        "--key", conv,
    )
    assert rep["rows"] > 0

    import pyarrow.compute as pc

    from bcdc2bcdc_ray.pipelines import denorm
    from bcdc2bcdc_ray.spec import TableSpec

    dim_dir = str(workdir["tmp"] / "dim")
    dim_spec = TableSpec(name="tools", schema=cg.gen_tool_dim().schema, key=("tool_id",))
    cdc.init_lake(cg.gen_tool_dim(), dim_dir, dim_spec, num_partitions=2)
    idx = str(workdir["tmp"] / "idx")
    _run(capsys, "create-index", idx, "--lake", workdir["lake"], "--col", "tool")
    dn = str(workdir["tmp"] / "dn")
    fch2 = str(workdir["tmp"] / "fch2")
    _run(
        capsys, "create-denorm", dn,
        "--fact", workdir["lake"], "--dim", dim_dir, "--fk", "tool",
        "--select", "tool_dest=dest_name", "--index", idx,
        "--fact-changes", fch2, "--dim-changes", str(workdir["tmp"] / "dch2"),
    )
    rep = _run(capsys, "denorm-lag", dn)
    assert rep == {"cmd": "denorm-lag", "fact_files": 0, "dim_files": 0}


def test_cli_scan_pruned_reads(capsys, workdir):
    """scan: column-pruned, key-pruned, predicate-pruned streaming reads,
    live and through a snapshot tag."""
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    lake_tbl = workdir["lake_table"]
    conv = lake_tbl.column("conv_id")[0].as_py()

    rep = _run(
        capsys, "scan", workdir["lake"],
        "--key", conv, "--columns", "conv_id,turn_idx", "--limit", "1000",
        "--count",
    )
    import pyarrow.compute as pc

    want = lake_tbl.filter(pc.equal(lake_tbl.column("conv_id"), conv)).num_rows
    assert rep["rows_total"] == want
    assert set(rep["records"][0]) == {"conv_id", "turn_idx"}

    rep = _run(
        capsys, "scan", workdir["lake"],
        "--where", "turn_idx:==:0", "--limit", "5", "--count",
    )
    want = lake_tbl.filter(pc.equal(lake_tbl.column("turn_idx"), 0)).num_rows
    assert rep["rows_total"] == want and rep["rows_returned"] == 5

    # snapshot scan answers from history after the live lake moved
    _run(capsys, "snapshot", "--lake", workdir["lake"], "--tag", "s0")
    _run(
        capsys, "replay", "--lake", workdir["lake"], "--wal", *workdir["wal"],
        "--spec", workdir["spec"],
    )
    rep = _run(
        capsys, "scan", workdir["lake"], "--tag", "s0", "--limit", "1",
        "--count",
    )
    assert rep["rows_total"] == lake_tbl.num_rows


def test_cli_sync_from(capsys, workdir, tmp_path):
    """One-command full-state sync: lake converges to the source parquet
    (the reference's whole main-binary job), rerun is a no-op."""
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "4",
    )
    target = cg.oracle_replay(workdir["lake_table"], workdir["events"])
    src = str(tmp_path / "target.parquet")
    pq.write_table(target, src)
    rep = _run(
        capsys, "sync-from", "--lake", workdir["lake"], "--source", src,
        "--spec", workdir["spec"],
    )
    assert rep["diff"]["events"] > 0
    # compare through falsy canonicalization (M6): "" and null are one state
    from bcdc2bcdc_ray.canonical import canonicalize
    from bcdc2bcdc_ray.spec import transcripts_spec

    falsy = transcripts_spec().falsy_null_columns
    assert canonicalize(cdc.read_lake_table(workdir["lake"]), falsy).equals(
        canonicalize(target, falsy)
    )
    rep2 = _run(
        capsys, "sync-from", "--lake", workdir["lake"], "--source", src,
        "--spec", workdir["spec"],
    )
    assert rep2["diff"]["events"] == 0 and rep2["adds"] == 0
    # dry-run: full what-would-change classify, zero writes
    pq.write_table(workdir["lake_table"], str(workdir["tmp"] / "back.parquet"))
    rep3 = _run(
        capsys, "sync-from", "--lake", workdir["lake"],
        "--source", str(workdir["tmp"] / "back.parquet"),
        "--spec", workdir["spec"], "--dry-run",
    )
    assert rep3["adds"] + rep3["updates"] + rep3["deletes"] > 0
    assert canonicalize(cdc.read_lake_table(workdir["lake"]), falsy).equals(
        canonicalize(target, falsy)
    )  # lake untouched by the dry run


def test_cli_time_bucket_view_and_timestamp_probe(capsys, workdir):
    """create-view --derive builds a tumbling-window view from the CLI and
    view-lookup parses a STRING timestamp probe into the bucket key."""
    _run(
        capsys, "init-lake",
        "--input", workdir["seed"], "--lake", workdir["lake"],
        "--spec", workdir["spec"], "--partitions", "8",
    )
    view_dir = str(workdir["tmp"] / "hview")
    rep = _run(
        capsys, "create-view",
        "--view", view_dir, "--lake", workdir["lake"],
        "--group-by", "hour", "--agg", "n_chars:sum_len:text",
        "--derive", "hour:time_bucket:ts:3600",
    )
    assert rep["view_rows"] > 0

    from bcdc2bcdc_ray.pipelines import view as vw

    first = vw.read_view(view_dir).column("hour")[0].as_py()
    rep = _run(
        capsys, "view-lookup", view_dir,
        "--value", first.strftime("%Y-%m-%d %H:%M:%S"),
    )
    assert rep["rows"] == 1 and rep["records"][0]["n_chars"] > 0
