"""Job entry point: ``python -m bcdc2bcdc_ray <cmd> ...``.

The Ray-native analog of the reference's main binary
(``/root/reference/bin/runBCDC2BCDC.py:231-279``): one process that owns
the Ray session, loads a declarative table spec, runs a lifecycle command
(seed / replay / follow / maintain / query) and emits ONE JSON report line
(the CacheFiles update-report analog) on stdout.

Designed for ``ray job submit -- python -m bcdc2bcdc_ray replay ...`` on a
multi-node cluster: the driver connects to the running cluster via
``RAY_ADDRESS`` (falls back to a local session when unset), all heavy work
is the distributed pipelines in :mod:`bcdc2bcdc_ray.pipelines.cdc`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session():
    """Connect to the job's cluster (``ray job submit`` sets RAY_ADDRESS)
    or start a local one. Guarded: only the CLI owns a session — library
    code never calls ray.init (driver/pytest own theirs)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    return ray


def _load_spec(arg: str | None):
    """``--spec path.json[:table]`` → TableSpec via the declarative config
    loader (bind-time hook/column validation); default transcripts spec."""
    from .spec import transcripts_spec

    if not arg:
        return transcripts_spec()
    from .config import load_spec

    path, _, table = arg.partition(":")
    return load_spec(path, table or None)


def _emit(report: dict) -> None:
    print(json.dumps(report, default=str))


def cmd_init_lake(args) -> dict:
    from .pipelines import cdc

    if args.streaming:
        # 100-TB shape: snapshot streams through the distributed writer
        rep = cdc.bootstrap_lake(
            args.input, args.lake, _load_spec(args.spec), args.partitions,
            fs_kind=args.fs,
        )
        return {"cmd": "init-lake", "streaming": True,
                "rows": rep["rows"], "partitions": args.partitions}
    import pyarrow.parquet as pq

    table = pq.read_table(args.input)
    cdc.init_lake(
        table, args.lake, _load_spec(args.spec), args.partitions, fs_kind=args.fs
    )
    return {"cmd": "init-lake", "rows": table.num_rows, "partitions": args.partitions}


def cmd_replay(args) -> dict:
    from .pipelines import cdc

    rep = cdc.replay(
        args.lake,
        args.wal,
        _load_spec(args.spec),
        salt=args.salt,
        combine=not args.no_combine,
        dry_run=args.dry_run,
        force=args.force,
        audit_dir=args.audit_dir,
        auto_compact_bytes=args.auto_compact_bytes,
        stats=args.stats,
        changes_dir=args.changes_dir,
        changes_before=args.changes_before,
    )
    rep.pop("lineage", None)  # per-partition rows go to --audit-dir, not stdout
    return {"cmd": "replay", **rep}


def cmd_follow(args) -> dict:
    from .pipelines import cdc

    rep = cdc.follow(
        args.lake,
        args.wal_dir,
        _load_spec(args.spec),
        max_rounds=args.max_rounds,
        idle_rounds_to_stop=args.idle_rounds,
        poll_sleep_s=args.poll_sleep,
    )
    return {"cmd": "follow", **rep}


def cmd_maintain(args) -> dict:
    from .pipelines import cdc

    if args.op == "split":
        cdc.split_partitions(args.lake)
    elif args.op == "merge":
        cdc.merge_partitions(args.lake)
    else:
        cdc.compact(args.lake, target_bytes=args.target_bytes)
    return {
        "cmd": "maintain",
        "op": args.op,
        "num_partitions": cdc.lake_meta(args.lake)["num_partitions"],
    }


def cmd_query(args) -> dict:
    from .pipelines.queries import queries

    fn = queries().get(args.name)
    if fn is None:
        raise SystemExit(f"unknown query {args.name!r}; see `list-queries`")
    res = fn(args.sf_dir)
    tbl = res if not hasattr(res, "to_arrow_refs") else None
    if tbl is None:
        import ray

        blocks = [ray.get(r) for r in res.to_arrow_refs()]
        blocks = [b for b in blocks if b.num_columns > 0]
        import pyarrow as pa

        tbl = pa.concat_tables(blocks) if blocks else pa.table({})
    elif hasattr(tbl, "to_arrow"):  # pandas
        import pyarrow as pa

        tbl = pa.Table.from_pandas(tbl)
    if args.out:
        import pyarrow.parquet as pq

        pq.write_table(tbl, args.out)
    return {
        "cmd": "query",
        "name": args.name,
        "rows": tbl.num_rows,
        "columns": tbl.column_names,
        "out": args.out,
    }


def cmd_stats(args) -> dict:
    from .pipelines import cdc

    return {"cmd": "stats", **cdc.lake_stats(args.lake)}


def cmd_lookup(args) -> dict:
    from .pipelines import cdc

    t = cdc.lookup(args.lake, args.key)
    return {
        "cmd": "lookup",
        "key": args.key,
        "rows": t.num_rows,
        "records": t.to_pylist() if t.num_rows <= 100 else t.num_rows,
    }


def cmd_fsck(args) -> dict:
    from .pipelines import cdc

    return {
        "cmd": "fsck",
        **cdc.fsck(args.lake, _load_spec(args.spec), parallel=args.parallel),
    }


def cmd_diff(args) -> dict:
    from .pipelines import cdc

    return {
        "cmd": "diff",
        **cdc.diff_lakes(args.dst, args.src, args.out, _load_spec(args.spec)),
    }


def cmd_sync_from(args) -> dict:
    """Full-state sync: make the lake equal a source parquet table/dir
    (stage → fingerprint-skipped diff → exactly-once replay)."""
    from .pipelines import cdc

    rep = cdc.sync_from(
        args.lake,
        args.source,
        _load_spec(args.spec),
        changes_dir=args.changes_dir,
        changes_before=args.changes_before,
        dry_run=args.dry_run,
    )
    rep.pop("lineage", None)
    return {"cmd": "sync-from", **rep}


def cmd_sync_out(args) -> dict:
    """Outbound sync: apply every not-yet-delivered change-feed file to a
    remote REST API (exactly-once via feed cursor + per-event LWW version
    guard; create-conflict → update fallback)."""
    from .sources import http_sink

    rep = http_sink.sync_out(
        args.changes,
        args.url,
        args.key,
        consumer=args.consumer,
        max_retries=args.max_retries,
        min_interval_s=args.min_interval,
    )
    return {"cmd": "sync-out", **rep}


def _parse_pred_value(v: str):
    """CLI predicate/set literal → typed value: int, float, ISO timestamp,
    else string (matches the lake column's arrow comparison semantics)."""
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    try:
        import datetime as dt

        return dt.datetime.fromisoformat(v)
    except ValueError:
        return v


def _parse_where(items: list[str]):
    """``col:op:value`` conjuncts (op ∈ <,<=,>,>=,==,between; between takes
    ``lo..hi``)."""
    preds = []
    for it in items:
        col, op, val = it.split(":", 2)
        if op == "between":
            lo, hi = val.split("..", 1)
            preds.append(
                (col, op, (_parse_pred_value(lo), _parse_pred_value(hi)))
            )
        else:
            preds.append((col, op, _parse_pred_value(val)))
    return preds


def cmd_delete_where(args) -> dict:
    from .pipelines import cdc

    kw = {}
    if args.changes:
        kw["changes_dir"] = args.changes
        kw["changes_before"] = args.changes_before
    rep = cdc.delete_where(
        args.lake, _parse_where(args.where), _load_spec(args.spec),
        out_dir=args.out, apply=not args.no_apply,
        index_dir=args.index, index_changes_dir=args.index_changes, **kw,
    )
    return {"cmd": "delete-where", **rep}


def cmd_update_where(args) -> dict:
    from .pipelines import cdc

    set_values = {}
    for it in args.set:
        col, val = it.split("=", 1)
        set_values[col] = _parse_pred_value(val)
    kw = {}
    if args.changes:
        kw["changes_dir"] = args.changes
        kw["changes_before"] = args.changes_before
    rep = cdc.update_where(
        args.lake, _parse_where(args.where), set_values, _load_spec(args.spec),
        out_dir=args.out, apply=not args.no_apply,
        index_dir=args.index, index_changes_dir=args.index_changes, **kw,
    )
    return {"cmd": "update-where", **rep}


def cmd_create_index(args) -> dict:
    from .pipelines import cdc

    col = args.col[0] if len(args.col) == 1 else list(args.col)
    return {
        "cmd": "create-index",
        **cdc.create_index(args.index, args.lake, col),
    }


def cmd_lookup_by(args) -> dict:
    from .pipelines import cdc

    value = args.value[0] if len(args.value) == 1 else tuple(args.value)
    t = cdc.lookup_by(args.lake, args.index, value)
    return {
        "cmd": "lookup-by",
        "value": list(args.value),
        "rows": t.num_rows,
        "records": t.to_pylist() if t.num_rows <= 100 else t.num_rows,
    }


def cmd_create_denorm(args) -> dict:
    from .pipelines import denorm

    sel = {}
    for it in args.select:
        out, src = it.split("=", 1)
        sel[out] = src
    rep = denorm.create_denorm(
        args.denorm, args.fact, args.dim, args.fk, sel,
        index_dir=args.index,
        fact_changes_dir=args.fact_changes,
        dim_changes_dir=args.dim_changes,
    )
    return {"cmd": "create-denorm", **rep}


def cmd_refresh_denorm(args) -> dict:
    from .pipelines import denorm

    kw = {}
    if args.changes:
        kw["changes_dir"] = args.changes
    return {"cmd": "refresh-denorm", **denorm.refresh_denorm(args.denorm, **kw)}


def cmd_resolve_misses(args) -> dict:
    """Heal NULLed join columns whose FK now resolves (out-of-band dim
    advance — no feed). The feed path heals automatically in refresh."""
    from .pipelines import denorm

    return {"cmd": "resolve-misses", **denorm.resolve_misses(args.denorm)}


def cmd_scan(args) -> dict:
    """Pruned streaming read of a lake (or snapshot via --tag): columns=
    prunes at the parquet reader, --key prunes to k files by partition
    hash, --where prunes partitions by footer zone maps then filters rows
    exactly. Rows stream; only min(--limit) rows reach the driver."""
    from .pipelines import cdc

    lake = args.lake
    if args.tag:
        lake = cdc.snapshot_path(args.lake, args.tag)
    kw: dict = {}
    if args.columns:
        kw["columns"] = args.columns.split(",")
    if args.key:
        kw["keys"] = args.key
    if args.where:
        kw["predicate"] = _parse_where(args.where)
    ds = cdc.read_lake(lake, **kw)
    rows = []
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        n += b.num_rows
        if len(rows) < args.limit:
            rows.extend(b.slice(0, args.limit - len(rows)).to_pylist())
        if args.limit and n >= args.limit and not args.count:
            break
    out: dict = {"cmd": "scan", "rows_returned": len(rows)}
    if args.count:
        out["rows_total"] = n
    out["records"] = rows
    return out


def cmd_denorm_lag(args) -> dict:
    from .pipelines import denorm

    return {"cmd": "denorm-lag", **denorm.lag(args.denorm)}


def cmd_denorm_fsck(args) -> dict:
    from .pipelines import denorm

    return {
        "cmd": "denorm-fsck",
        **denorm.fsck(args.denorm, sample_frac=args.sample),
    }


def cmd_read_snapshot(args) -> dict:
    from .pipelines import cdc

    if args.key is not None:
        t = cdc.lookup(cdc.snapshot_path(args.lake, args.tag), args.key)
        return {
            "cmd": "read-snapshot", "tag": args.tag, "rows": t.num_rows,
            "records": t.to_pylist() if t.num_rows <= 100 else t.num_rows,
        }
    st = cdc.lake_stats(cdc.snapshot_path(args.lake, args.tag))
    return {"cmd": "read-snapshot", "tag": args.tag, "stats": st}


def cmd_view_lookup(args) -> dict:
    from .pipelines import view

    t = view.lookup(args.view, args.value)
    return {
        "cmd": "view-lookup",
        "value": args.value,
        "rows": t.num_rows,
        "records": t.to_pylist() if t.num_rows <= 100 else t.num_rows,
    }


def cmd_prune_panes(args) -> dict:
    from .pipelines import view

    return {"cmd": "prune-panes", **view.prune_panes(args.view, args.older_than)}


def cmd_view_window(args) -> dict:
    from .pipelines import view

    t = view.read_window(args.view, args.width, args.slide)
    return {
        "cmd": "view-window",
        "width_s": args.width,
        "slide_s": args.slide or args.width,
        "rows": t.num_rows,
        "records": t.to_pylist() if t.num_rows <= 100 else t.num_rows,
    }


def cmd_snapshot(args) -> dict:
    from .pipelines import cdc

    if args.stats:
        return {"cmd": "snapshot", "stats": cdc.snapshot_stats(args.lake)}
    if args.list:
        return {"cmd": "snapshot", "snapshots": cdc.list_snapshots(args.lake)}
    return {"cmd": "snapshot", **cdc.snapshot(args.lake, args.tag)}


def cmd_prune_snapshots(args) -> dict:
    from .pipelines import cdc

    tags = args.tag or None
    return {
        "cmd": "prune-snapshots",
        **cdc.prune_snapshots(args.lake, keep=args.keep, tags=tags),
    }


def cmd_restore(args) -> dict:
    from .pipelines import cdc

    return {"cmd": "restore", **cdc.restore(args.lake, args.tag)}


def _parse_agg(s: str):
    """``out:kind[:col[:lo,hi,bins,q]]`` — the 4th field parameterizes
    ``hist`` (fixed-width histogram bounds + the surfaced quantile)."""
    from .pipelines import view

    parts = s.split(":")
    if len(parts) == 4 and parts[1] == "hist":
        lo, hi, bins, q = parts[3].split(",")
        return view.AggSpec(
            parts[0], "hist", parts[2],
            arg={"lo": float(lo), "hi": float(hi), "bins": int(bins),
                 "q": float(q)},
        )
    if len(parts) > 3:  # a 4th field means hist — anything else is a typo
        raise SystemExit(
            f"--agg {s!r}: only kind 'hist' takes a 4th field "
            f"(lo,hi,bins,q); got kind {parts[1]!r}"
        )
    return view.AggSpec(*parts)


def cmd_create_view(args) -> dict:
    from .pipelines import view

    aggs = [_parse_agg(a) for a in args.agg]
    derive = []
    for s in args.derive:
        out, kind, col, arg = s.split(":")
        derive.append(view.DeriveSpec(out, kind, col, int(arg)))
    rep = view.create_view(
        args.view, args.lake, args.group_by.split(","), aggs,
        num_partitions=args.partitions, derive=derive or None,
    )
    rep.pop("consumed", None)
    return {"cmd": "create-view", **rep}


def cmd_refresh_view(args) -> dict:
    from .pipelines import view

    return {"cmd": "refresh-view", **view.refresh_view(args.view, args.changes_dir)}


def cmd_add_aggregate(args) -> dict:
    from .pipelines import view

    agg = _parse_agg(args.agg)
    return {
        "cmd": "add-aggregate",
        **view.add_aggregate(args.view, args.changes_dir, agg),
    }


def cmd_view_fsck(args) -> dict:
    from .pipelines import view

    return {"cmd": "view-fsck", **view.fsck(args.view)}


def cmd_view_lag(args) -> dict:
    from .pipelines import view

    return {"cmd": "view-lag", **view.lag(args.view, args.changes_dir)}


def cmd_prune_changes(args) -> dict:
    from .pipelines import cdc, view

    if args.view:
        consumed: dict = None
        for v in args.view:
            c = view._load_consumed(v)
            consumed = c if consumed is None else {
                k: min(consumed.get(k, -1), c.get(k, -1))
                for k in set(consumed) | set(c)
            }
    else:
        consumed = {}
    return {"cmd": "prune-changes", **cdc.prune_changes(args.changes_dir, consumed)}


def cmd_list_queries(_args) -> dict:
    from .pipelines.queries import oracle_sql, queries

    qs, sq = queries(), oracle_sql()
    return {
        "cmd": "list-queries",
        "count": len(qs),
        "queries": [{"name": n, "oracle": n in sq} for n in qs],
    }


def cmd_demo(args) -> dict:
    """Self-contained smoke job: synthesize a lake + WAL, replay, verify
    against the in-process oracle, rerun for exactly-once. The one-command
    ``ray job submit`` acceptance check."""
    import tempfile

    from . import changegen as cg
    from .pipelines import cdc
    from .spec import transcripts_spec

    from .pipelines import view

    spec = transcripts_spec()
    root = tempfile.mkdtemp(prefix="bcdc2bcdc_demo_")
    lake_dir = os.path.join(root, "lake")
    changes = os.path.join(root, "changes")
    view_dir = os.path.join(root, "view")
    lake = cg.gen_transcripts(args.convs, seed=42)
    cdc.init_lake(lake, lake_dir, spec, num_partitions=args.partitions)
    view.create_view(
        view_dir, lake_dir, ["conv_id"],
        [view.AggSpec("n_rows", "count"), view.AggSpec("n_chars", "sum_len", "text")],
    )
    ev = cg.gen_change_events(args.events, args.convs, seed=43)
    paths = cg.write_wal_chunks(ev, os.path.join(root, "wal"), num_chunks=8)
    rep = cdc.replay(
        lake_dir, paths, spec, salt=args.salt,
        changes_dir=changes, changes_before=True,
    )
    final = cdc.read_lake_table(lake_dir)
    ok = final.equals(cg.oracle_replay(lake, ev))
    rep2 = cdc.replay(lake_dir, paths, spec, changes_dir=changes, changes_before=True)
    exactly_once = rep2["adds"] + rep2["updates"] + rep2["deletes"] == 0
    # feed → incrementally-maintained view must equal a recompute
    view.refresh_view(view_dir, changes)
    import pyarrow as pa
    import pyarrow.compute as _pc

    txt = _pc.fill_null(_pc.utf8_length(final.column("text")), 0)
    agg = (
        final.append_column("__n", _pc.cast(txt, pa.int64()))
        .group_by(["conv_id"])
        .aggregate([("conv_id", "count"), ("__n", "sum")])
        .rename_columns(["conv_id", "n_rows", "n_chars"])
        .sort_by([("conv_id", "ascending")])
    )
    view_match = view.read_view(view_dir).equals(
        agg.cast(view.read_view(view_dir).schema)
    )
    return {
        "cmd": "demo",
        "events": args.events,
        "oracle_match": ok,
        "exactly_once_rerun": exactly_once,
        "view_match": view_match,
        "adds": rep["adds"],
        "updates": rep["updates"],
        "deletes": rep["deletes"],
        "workdir": root,
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m bcdc2bcdc_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    il = sub.add_parser("init-lake", help="seed a lake from a parquet table")
    il.add_argument("--input", required=True)
    il.add_argument("--lake", required=True)
    il.add_argument("--spec")
    il.add_argument("--partitions", type=int, default=16)
    il.add_argument(
        "--streaming", action="store_true",
        help="stream the snapshot through the distributed writer "
             "(exactly-once, resumable) instead of loading it on the driver",
    )
    il.add_argument(
        "--fs", choices=["posix", "object"], default=None,
        help="storage commit protocol (default $BCDC_LAKE_FS, else posix): "
             "posix = rename/hardlink, object = object-store PUT/lease/copy",
    )
    il.set_defaults(fn=cmd_init_lake)

    rp = sub.add_parser("replay", help="replay WAL chunks against a lake")
    rp.add_argument("--lake", required=True)
    rp.add_argument("--wal", nargs="+", required=True)
    rp.add_argument("--spec")
    rp.add_argument("--salt", type=int)
    rp.add_argument("--no-combine", action="store_true")
    rp.add_argument("--dry-run", action="store_true")
    rp.add_argument("--force", action="store_true")
    rp.add_argument("--audit-dir")
    rp.add_argument("--changes-dir", help="emit the outbound CDC change feed here")
    rp.add_argument(
        "--changes-before", action="store_true",
        help="add before_* pre-image columns to the feed (view maintenance)",
    )
    rp.add_argument("--auto-compact-bytes", type=int)
    rp.add_argument("--stats", action="store_true")
    rp.set_defaults(fn=cmd_replay)

    fl = sub.add_parser("follow", help="tail a WAL directory (micro-batch)")
    fl.add_argument("--lake", required=True)
    fl.add_argument("--wal-dir", required=True)
    fl.add_argument("--spec")
    fl.add_argument("--max-rounds", type=int, default=100)
    fl.add_argument("--idle-rounds", type=int, default=1)
    fl.add_argument("--poll-sleep", type=float, default=0.0)
    fl.set_defaults(fn=cmd_follow)

    mt = sub.add_parser("maintain", help="lake maintenance (distributed)")
    mt.add_argument("op", choices=["split", "merge", "compact"])
    mt.add_argument("--lake", required=True)
    mt.add_argument("--target-bytes", type=int, default=256 << 20)
    mt.set_defaults(fn=cmd_maintain)

    qr = sub.add_parser("query", help="run one registered pipeline")
    qr.add_argument("--name", required=True)
    qr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qr.add_argument("--out")
    qr.set_defaults(fn=cmd_query)

    st = sub.add_parser("stats", help="lake summary from metadata only")
    st.add_argument("--lake", required=True)
    st.set_defaults(fn=cmd_stats)

    lk = sub.add_parser("lookup", help="O(1)-file point read by partition key")
    lk.add_argument("--lake", required=True)
    lk.add_argument("--key", required=True)
    lk.set_defaults(fn=cmd_lookup)

    fs = sub.add_parser("fsck", help="lake integrity audit (read-only)")
    fs.add_argument("--lake", required=True)
    fs.add_argument("--spec")
    fs.add_argument("--parallel", action="store_true")
    fs.set_defaults(fn=cmd_fsck)

    df = sub.add_parser(
        "diff", help="emit the WAL that makes DST equal SRC (co-partitioned lakes)"
    )
    df.add_argument("--dst", required=True)
    df.add_argument("--src", required=True)
    df.add_argument("--out", required=True)
    df.add_argument("--spec")
    df.set_defaults(fn=cmd_diff)

    sf = sub.add_parser(
        "sync-from",
        help="make the lake equal a full-state source parquet "
        "(stage, diff, exactly-once apply)",
    )
    sf.add_argument("--lake", required=True)
    sf.add_argument("--source", required=True, help="parquet file or directory")
    sf.add_argument("--spec")
    sf.add_argument("--changes-dir")
    sf.add_argument("--changes-before", action="store_true")
    so = sub.add_parser(
        "sync-out",
        help="apply unconsumed change-feed files to a remote REST API "
        "(exactly-once: feed cursor + per-event version guard)",
    )
    so.add_argument("--changes", required=True, help="change-feed directory")
    so.add_argument("--url", required=True, help="destination base URL")
    so.add_argument(
        "--key", action="append", required=True,
        help="key column (repeat for composite keys)",
    )
    so.add_argument("--consumer", default="http-sink")
    so.add_argument("--max-retries", type=int, default=5)
    so.add_argument(
        "--min-interval", type=float, default=0.0,
        help="per-connection rate limit (seconds between POSTs)",
    )
    so.set_defaults(fn=cmd_sync_out)

    sf.add_argument(
        "--dry-run", action="store_true",
        help="classify + count the what-would-change report, write nothing",
    )
    sf.set_defaults(fn=cmd_sync_from)

    for nm, fn, hlp in (
        ("delete-where", cmd_delete_where,
         "bulk delete rows matching a predicate (retention / erasure)"),
        ("update-where", cmd_update_where,
         "bulk constant-overwrite of rows matching a predicate"),
    ):
        mw = sub.add_parser(nm, help=hlp)
        mw.add_argument("lake")
        mw.add_argument(
            "--where", action="append", required=True, metavar="COL:OP:VAL",
            help="conjunct, op in <,<=,>,>=,==,between (between: lo..hi); "
                 "repeatable",
        )
        if nm == "update-where":
            mw.add_argument(
                "--set", action="append", required=True, metavar="COL=VAL",
                help="column constant overwrite; repeatable",
            )
        mw.add_argument("--spec", default=None)
        mw.add_argument("--out", default=None, help="keep the emitted WAL here")
        mw.add_argument(
            "--no-apply", action="store_true",
            help="emit the plan WAL only (requires --out)",
        )
        mw.add_argument("--changes", default=None, help="outbound feed dir")
        mw.add_argument("--changes-before", action="store_true")
        mw.add_argument(
            "--index", default=None,
            help="secondary index dir: resolve an == conjunct's keys "
                 "through one index file and scan only their partitions",
        )
        mw.add_argument(
            "--index-changes", default=None,
            help="refresh the index from this feed dir before probing",
        )
        mw.set_defaults(fn=fn)

    ci = sub.add_parser(
        "create-index",
        help="feed-maintained secondary index on one or more columns",
    )
    ci.add_argument("index")
    ci.add_argument("--lake", required=True)
    ci.add_argument(
        "--col", required=True, nargs="+",
        help="indexed column(s); first routes the probe (composite index)",
    )
    ci.set_defaults(fn=cmd_create_index)

    lb = sub.add_parser(
        "lookup-by", help="non-key point read via a secondary index"
    )
    lb.add_argument("lake")
    lb.add_argument("--index", required=True)
    lb.add_argument(
        "--value", required=True, nargs="+",
        help="probe value(s), one per indexed column in index order",
    )
    lb.set_defaults(fn=cmd_lookup_by)

    cdn = sub.add_parser(
        "create-denorm",
        help="materialize fact LEFT JOIN dim as a feed-maintained lake",
    )
    cdn.add_argument("denorm")
    cdn.add_argument("--fact", required=True)
    cdn.add_argument("--dim", required=True)
    cdn.add_argument("--fk", required=True)
    cdn.add_argument(
        "--select", action="append", required=True,
        help="out_col=dim_col (repeatable)",
    )
    cdn.add_argument("--index", required=True, help="secondary index on fact.fk")
    cdn.add_argument("--fact-changes", required=True)
    cdn.add_argument("--dim-changes", required=True)
    cdn.set_defaults(fn=cmd_create_denorm)

    rdn = sub.add_parser(
        "refresh-denorm", help="fold both change feeds into a denorm lake"
    )
    rdn.add_argument("denorm")
    rdn.add_argument("--changes", default=None, help="denorm's own outbound feed dir")
    rdn.set_defaults(fn=cmd_refresh_denorm)

    rm = sub.add_parser(
        "resolve-misses",
        help="heal dangling-FK join columns against the current dim "
        "(lazy miss resolution for out-of-band dim advances)",
    )
    rm.add_argument("denorm")
    rm.set_defaults(fn=cmd_resolve_misses)

    sc = sub.add_parser(
        "scan",
        help="pruned streaming read: --columns/--key/--where, snapshot via --tag",
    )
    sc.add_argument("lake")
    sc.add_argument("--tag", default=None, help="read a named snapshot instead")
    sc.add_argument("--columns", default=None, help="comma-separated")
    sc.add_argument("--key", action="append", default=None,
                    help="partition-key value (repeatable)")
    sc.add_argument("--where", action="append", default=None,
                    help="col:op:value conjunct (repeatable; op: <,<=,>,>=,==,between lo..hi)")
    sc.add_argument("--limit", type=int, default=20)
    sc.add_argument("--count", action="store_true",
                    help="also stream to the end and report rows_total")
    sc.set_defaults(fn=cmd_scan)

    dlg = sub.add_parser(
        "denorm-lag", help="pending feed files per side of a denorm lake"
    )
    dlg.add_argument("denorm")
    dlg.set_defaults(fn=cmd_denorm_lag)

    dfs = sub.add_parser(
        "denorm-fsck",
        help="join-consistency audit: recompute sampled convs from the bases",
    )
    dfs.add_argument("denorm")
    dfs.add_argument("--sample", type=float, default=0.05)
    dfs.set_defaults(fn=cmd_denorm_fsck)

    rsn = sub.add_parser(
        "read-snapshot",
        help="time-travel read of a named snapshot (no restore): "
        "stats, or a point read with --key",
    )
    rsn.add_argument("--lake", required=True)
    rsn.add_argument("--tag", required=True)
    rsn.add_argument("--key", default=None, help="partition-key point read")
    rsn.set_defaults(fn=cmd_read_snapshot)

    vlk = sub.add_parser(
        "view-lookup", help="O(1)-file point probe on a view's first group column"
    )
    vlk.add_argument("view")
    vlk.add_argument("--value", required=True)
    vlk.set_defaults(fn=cmd_view_lookup)

    vwin = sub.add_parser(
        "view-window",
        help="sliding/hopping windows folded from a tumbling-pane view",
    )
    vwin.add_argument("view")
    vwin.add_argument("--width", type=int, required=True, help="seconds")
    vwin.add_argument("--slide", type=int, help="seconds (default: width)")
    vwin.set_defaults(fn=cmd_view_window)

    vpp = sub.add_parser(
        "prune-panes",
        help="retention: drop pane groups older than a watermark; later "
        "feed deltas for expired panes are consumed-by-policy",
    )
    vpp.add_argument("view")
    vpp.add_argument("--older-than", required=True, help="ISO timestamp")
    vpp.set_defaults(fn=cmd_prune_panes)

    sp = sub.add_parser("snapshot", help="zero-copy named lake snapshot")
    sp.add_argument("--lake", required=True)
    sp.add_argument("--tag")
    sp.add_argument("--list", action="store_true")
    sp.add_argument(
        "--stats", action="store_true",
        help="per-snapshot disk cost (exclusive vs hardlink-shared bytes)",
    )
    sp.set_defaults(fn=cmd_snapshot)

    ps = sub.add_parser(
        "prune-snapshots", help="snapshot retention GC (keep the N newest)"
    )
    ps.add_argument("--lake", required=True)
    ps.add_argument("--keep", type=int, default=0)
    ps.add_argument("--tag", action="append", help="prune exactly these tags")
    ps.set_defaults(fn=cmd_prune_snapshots)

    rs = sub.add_parser("restore", help="roll the lake back to a snapshot")
    rs.add_argument("--lake", required=True)
    rs.add_argument("--tag", required=True)
    rs.set_defaults(fn=cmd_restore)

    cv = sub.add_parser(
        "create-view", help="build an incremental aggregate view over a lake"
    )
    cv.add_argument("--view", required=True)
    cv.add_argument("--lake", required=True)
    cv.add_argument("--group-by", required=True, help="comma-separated columns")
    cv.add_argument(
        "--agg", action="append", default=[],
        help="out:kind[:col] (count|sum|sum_len|sum_sq|min|max|hll) or "
        "out:hist:col:lo,hi,bins,q (repeatable)",
    )
    cv.add_argument(
        "--derive", action="append", default=[],
        help="out:kind:col:width — derived group column (time_bucket width"
        " in seconds | int_bucket), use out in --group-by (repeatable)",
    )
    cv.add_argument("--partitions", type=int)
    cv.set_defaults(fn=cmd_create_view)

    rv = sub.add_parser(
        "refresh-view", help="fold fresh change-feed files into a view"
    )
    rv.add_argument("--view", required=True)
    rv.add_argument("--changes-dir", required=True)
    rv.set_defaults(fn=cmd_refresh_view)

    aa = sub.add_parser(
        "add-aggregate", help="widen a live view with one pruned lake pass"
    )
    aa.add_argument("--view", required=True)
    aa.add_argument("--changes-dir")
    aa.add_argument("--agg", required=True, help="out:kind[:col]")
    aa.set_defaults(fn=cmd_add_aggregate)

    vf = sub.add_parser("view-fsck", help="view integrity audit (read-only)")
    vf.add_argument("--view", required=True)
    vf.set_defaults(fn=cmd_view_fsck)

    vl = sub.add_parser("view-lag", help="feed files/rows past a view's cursor")
    vl.add_argument("--view", required=True)
    vl.add_argument("--changes-dir", required=True)
    vl.set_defaults(fn=cmd_view_lag)

    pc_ = sub.add_parser(
        "prune-changes",
        help="delete feed files consumed by every listed view (min cursor)",
    )
    pc_.add_argument("--changes-dir", required=True)
    pc_.add_argument(
        "--view", action="append", default=[],
        help="consumer view dir (repeatable); pruning uses the min cursor",
    )
    pc_.set_defaults(fn=cmd_prune_changes)

    lq = sub.add_parser("list-queries", help="list registered pipelines")
    lq.set_defaults(fn=cmd_list_queries)

    dm = sub.add_parser("demo", help="synthesize + replay + verify smoke job")
    dm.add_argument("--convs", type=int, default=300)
    dm.add_argument("--events", type=int, default=20_000)
    dm.add_argument("--partitions", type=int, default=16)
    dm.add_argument("--salt", type=int)
    dm.set_defaults(fn=cmd_demo)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import ray

    owned = not ray.is_initialized()  # in-process callers keep their session
    _ray_session()
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        _emit(args.fn(args))
        return 0
    finally:
        if owned:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
