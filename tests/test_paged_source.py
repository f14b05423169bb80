"""Paged streaming-source adapter (sources/paged.py) — the non-file ingest
path re-expressing the reference's windowed async fetch with retry/verify
(CKAN.py:1085-1266 CKANAsyncWrapper)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bcdc2bcdc_ray import changegen as cg
from bcdc2bcdc_ray.sources import paged


def _endpoint(tmp_path, n_events=3000, n_convs=80, seed=5) -> str:
    """Write the change-event stream the fake endpoint serves."""
    ev = cg.gen_change_events(n_events, n_convs, seed=seed)
    path = str(tmp_path / "endpoint.parquet")
    pq.write_table(ev, path)
    return path


# NOTE: the fault-injection clients live in the PACKAGE
# (paged.TruncatingPageClient / paged.FailingPageClient), not here — a class
# defined in a pytest module pickles by reference and Ray workers cannot
# import the test module, which turns actor creation into an infinite
# restart loop under the default max_restarts=-1.


def _start_paged_http_server(table: pa.Table, page_size: int):
    """stdlib http.server fixture serving the paged protocol with injected
    faults: the FIRST attempt at every 3rd page answers 503; the FIRST
    attempt at every page ≡ 1 (mod 4) sends a TRUNCATED body under a full
    Content-Length (the silent-missing-data case). Attempt counts are
    server-side, so retries from any fetch actor see the repaired page."""
    import http.server
    import io
    import json as _json
    import re as _re
    import threading

    n = table.num_rows
    pages: dict[int, bytes] = {}
    for p in range((n + page_size - 1) // page_size):
        buf = io.BytesIO()
        pq.write_table(table.slice(p * page_size, page_size), buf)
        pages[p] = buf.getvalue()
    attempts: dict[int, int] = {}
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_GET(self):
            if self.path == "/meta":
                body = _json.dumps(
                    {"num_rows": n, "page_size": page_size}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            m = _re.fullmatch(r"/page/(\d+)", self.path)
            if not m or int(m.group(1)) not in pages:
                self.send_response(404)
                self.end_headers()
                return
            p = int(m.group(1))
            with lock:
                att = attempts.get(p, 0)
                attempts[p] = att + 1
            if att == 0 and p % 3 == 0:
                self.send_response(503)
                self.end_headers()
                return
            body = pages[p]
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if att == 0 and p % 4 == 1 and len(body) > 8:
                self.wfile.write(body[:-8])  # truncated under full length
                return
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}", attempts


def test_read_paged_over_real_http_sockets(ray_session, tmp_path):
    """HTTPPageClient against a live stdlib http.server with injected 503s
    AND silent truncation: the adapter must deliver every row exactly once
    through real sockets (one client per fetch actor, retries in place).
    Proves the paged interface against actual network I/O, not just the
    local parquet doubles."""
    src = _endpoint(tmp_path, n_events=2500)
    table = pq.read_table(src)
    srv, url, attempts = _start_paged_http_server(table, page_size=300)
    try:
        client = paged.HTTPPageClient(url)
        assert len(client.pages()) == (table.num_rows + 299) // 300
        ds = paged.read_paged(
            paged.HTTPClientFactory(url), client.pages(),
            max_in_flight=4, bundle_size=2,
        )
        got = (
            pa.concat_tables(
                [
                    b.drop_columns(["__page"])
                    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
                    if b.num_rows
                ]
            )
            .sort_by([("lsn", "ascending")])
        )
        assert got.equals(table.sort_by([("lsn", "ascending")]))
        # the injected faults actually fired: every 3rd page needed >1 try
        assert all(v >= 2 for p, v in attempts.items() if p % 3 == 0)
        assert all(v >= 2 for p, v in attempts.items() if p % 4 == 1)
    finally:
        srv.shutdown()


def test_read_paged_complete_under_transient_failures(ray_session, tmp_path):
    path = _endpoint(tmp_path)
    total = pq.read_metadata(path).num_rows

    def factory():
        return paged.LocalParquetPageClient(
            path, page_size=256, fail_first_attempt_every=3
        )

    client = factory()
    ds = paged.read_paged(factory, client.pages(), max_in_flight=4, bundle_size=2)
    got = pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    )
    assert got.num_rows == total
    assert sorted(set(got.column("__page").to_pylist())) == client.pages()
    # every event survived exactly once
    assert sorted(got.column("lsn").to_pylist()) == sorted(
        pq.read_table(path).column("lsn").to_pylist()
    )


def test_verify_refetches_truncated_pages(ray_session, tmp_path):
    path = _endpoint(tmp_path, n_events=1000)
    total = pq.read_metadata(path).num_rows

    def factory():
        return paged.TruncatingPageClient(path, page_size=200)

    ds = paged.read_paged(factory, paged.TruncatingPageClient(path, 200).pages())
    got = pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    )
    assert got.num_rows == total  # short pages were rejected and refetched


def test_retry_exhaustion_raises(ray_session, tmp_path):
    path = _endpoint(tmp_path, n_events=500)

    def factory():
        return paged.FailingPageClient(path, page_size=200)

    ds = paged.read_paged(factory, [0, 1], max_retries=1)
    with pytest.raises(Exception, match="failed after 2 attempts"):
        ds.materialize()


def test_stream_to_wal_drives_follow(ray_session, tmp_path):
    """End-to-end continuous ingest: flaky paged endpoint → WAL chunk files
    → ``follow`` tail-replays them exactly-once to the oracle state."""
    from bcdc2bcdc_ray.pipelines import cdc
    from bcdc2bcdc_ray.spec import transcripts_spec

    spec = transcripts_spec()
    lake = cg.gen_transcripts(80, seed=4)
    ev = cg.gen_change_events(3000, 80, seed=5)
    endpoint = str(tmp_path / "endpoint.parquet")
    pq.write_table(ev, endpoint)

    lake_dir, wal_dir = str(tmp_path / "lake"), str(tmp_path / "wal")
    cdc.init_lake(lake, lake_dir, spec, num_partitions=8)

    def factory():
        return paged.LocalParquetPageClient(
            endpoint, page_size=500, fail_first_attempt_every=2
        )

    written = paged.stream_pages_to_wal(
        factory, factory().pages(), wal_dir, max_in_flight=4, bundle_size=2
    )
    assert written and all(os.path.exists(p) for p in written)

    rep = cdc.follow(lake_dir, wal_dir, spec, max_rounds=5)
    assert cdc.read_lake_table(lake_dir).equals(cg.oracle_replay(lake, ev))
    # a second follow sees nothing new (exactly-once through the adapter)
    rep2 = cdc.follow(lake_dir, wal_dir, spec, max_rounds=5)
    assert rep2["adds"] + rep2["updates"] + rep2["deletes"] == 0
    # idempotent re-ingest: overwriting the same per-page chunks changes
    # nothing on the next follow
    paged.stream_pages_to_wal(factory, factory().pages(), wal_dir)
    rep3 = cdc.follow(lake_dir, wal_dir, spec, max_rounds=5)
    assert rep3["adds"] + rep3["updates"] + rep3["deletes"] == 0
    assert cdc.read_lake_table(lake_dir).equals(cg.oracle_replay(lake, ev))


def test_full_relay_source_to_lake_to_view_capstone(ray_session, tmp_path):
    """The whole CDC relay in one test: flaky paged endpoint → WAL chunks →
    `follow` replays into the lake emitting the PRE-IMAGE change feed →
    `view.follow` folds the feed into a maintained per-conversation rollup.
    After the dust settles: lake == oracle, view == recompute, lag == 0,
    and every stage is a no-op on rerun."""
    from bcdc2bcdc_ray.pipelines import cdc, view
    from bcdc2bcdc_ray.spec import transcripts_spec

    spec = transcripts_spec()
    lake0 = cg.gen_transcripts(80, seed=4)
    ev = cg.gen_change_events(3000, 80, seed=5)
    endpoint = str(tmp_path / "endpoint.parquet")
    pq.write_table(ev, endpoint)
    lake_dir, wal_dir = str(tmp_path / "lake"), str(tmp_path / "wal")
    changes, view_dir = str(tmp_path / "changes"), str(tmp_path / "view")

    cdc.init_lake(lake0, lake_dir, spec, num_partitions=8)
    view.create_view(
        view_dir, lake_dir, ["conv_id"],
        [
            view.AggSpec("n_rows", "count"),
            view.AggSpec("n_chars", "sum_len", "text"),
            view.AggSpec("max_turn", "max", "turn_idx"),
        ],
    )

    def factory():
        return paged.LocalParquetPageClient(
            endpoint, page_size=500, fail_first_attempt_every=2
        )

    paged.stream_pages_to_wal(factory, factory().pages(), wal_dir)
    cdc.follow(
        lake_dir, wal_dir, spec, max_rounds=5,
        changes_dir=changes, changes_before=True,
    )
    rep = view.follow(view_dir, changes, max_rounds=5)
    assert rep["applied_rows"] > 0

    # lake matches the oracle; view matches a recompute of the lake
    final = cdc.read_lake_table(lake_dir)
    assert final.equals(cg.oracle_replay(lake0, ev))
    df = final.to_pandas()
    df["n_chars"] = df.text.str.len().fillna(0).astype("int64")
    g = (
        df.groupby("conv_id")
        .agg(n_rows=("conv_id", "size"), n_chars=("n_chars", "sum"),
             max_turn=("turn_idx", "max"))
        .reset_index()
    )
    expect = pa.table(
        {
            "conv_id": pa.array(g.conv_id, pa.string()),
            "n_rows": pa.array(g.n_rows, pa.int64()),
            "n_chars": pa.array(g.n_chars, pa.int64()),
            "max_turn": pa.array(g.max_turn, pa.int32()),
        }
    ).sort_by([("conv_id", "ascending")])
    assert view.read_view(view_dir).equals(expect)
    assert view.lag(view_dir, changes) == {"files": 0, "rows": 0}

    # rerun every stage: nothing moves
    paged.stream_pages_to_wal(factory, factory().pages(), wal_dir)
    rep2 = cdc.follow(
        lake_dir, wal_dir, spec, max_rounds=5,
        changes_dir=changes, changes_before=True,
    )
    assert rep2["adds"] + rep2["updates"] + rep2["deletes"] == 0
    assert view.follow(view_dir, changes, max_rounds=3)["applied_rows"] == 0
    assert view.read_view(view_dir).equals(expect)
