"""Idempotent remote-API sink (sources/http_sink.py) over a real-socket
stdlib http.server: injected 503s, create-conflict → update fallback,
duplicate delivery deduped by server-side idempotency keys, exactly-once
reruns via the feed cursor — the outbound mirror of the round-4 paged-source
test (VERDICT r4 next-round #4)."""

import json
import os
import threading

import pyarrow.parquet as pq
import pytest

from bcdc2bcdc_ray import changegen as cg
from bcdc2bcdc_ray.pipelines import cdc
from bcdc2bcdc_ray.sources import http_sink
from bcdc2bcdc_ray.spec import transcripts_spec


def _start_sink_server(fail_every: int = 7):
    """REST destination double: /create (409 on existing key), /update
    (404 on missing), /delete (404 on missing, but the tombstone version
    still records); every ``fail_every``-th request fails once with a 503
    BEFORE applying (transient). The server keeps the max applied ``_lsn``
    per key (tombstones included) and no-ops any stale-or-duplicate event
    with ``{"dup": true}`` — the LWW version guard the sink's wire
    contract is built for (order-safe under redelivery)."""
    import http.server

    state = {
        "records": {},          # key tuple -> payload dict
        "versions": {},         # key tuple -> max applied lsn (incl. tombstones)
        "n_requests": 0,
        "n_503": 0,
        "lock": threading.Lock(),
    }

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            payload = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            with state["lock"]:
                state["n_requests"] += 1
                if fail_every and state["n_requests"] % fail_every == 0:
                    state["n_503"] += 1
                    return self._reply(503, {"error": "transient"})
                payload.pop("_idem")
                lsn = int(payload.pop("_lsn"))
                key = (payload.get("conv_id"), payload.get("turn_idx"))
                if lsn <= state["versions"].get(key, -1):
                    return self._reply(200, {"dup": True})
                if self.path == "/create":
                    if key in state["records"]:
                        # genuine conflict: do NOT record the version — the
                        # sink's fallback update carries the same lsn
                        return self._reply(409, {"error": "exists"})
                    state["records"][key] = payload
                elif self.path == "/update":
                    if key not in state["records"]:
                        return self._reply(404, {"error": "missing"})
                    state["records"][key] = payload
                elif self.path == "/delete":
                    state["versions"][key] = lsn  # tombstone version
                    if key not in state["records"]:
                        return self._reply(404, {"error": "missing"})
                    del state["records"][key]
                else:
                    return self._reply(400, {"error": "bad path"})
                state["versions"][key] = lsn
                return self._reply(200, {"ok": True})

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}", state


def _feed_oracle(changes_dir: str) -> dict:
    """Dict replay of the feed files (per-pid lsn order; keys are
    partition-disjoint, so a global (pid, lsn) sort is a valid order):
    what a converged remote must hold."""
    expected: dict = {}
    for fn in sorted(os.listdir(changes_dir)):
        if not (fn.startswith("changes-") and fn.endswith(".parquet")):
            continue
        t = pq.read_table(os.path.join(changes_dir, fn))
        t = t.drop_columns([c for c in t.column_names if c.startswith("before_")])
        for row in t.to_pylist():
            key = (row["conv_id"], row["turn_idx"])
            if row["op"] == "delete":
                expected.pop(key, None)
            else:
                expected[key] = {
                    k: v for k, v in row.items() if k not in ("lsn", "op")
                }
    return expected


def _normalize(d: dict) -> dict:
    # the sink JSON-serializes non-JSON types with default=str (timestamps)
    return {k: (str(v) if v is not None and k == "ts" else v) for k, v in d.items()}


@pytest.fixture
def sink_env(tmp_path):
    spec = transcripts_spec()
    lake_dir = str(tmp_path / "lake")
    ch = str(tmp_path / "ch")
    cdc.init_lake(cg.gen_transcripts(80, seed=42), lake_dir, spec, num_partitions=8)
    # two replay waves over overlapping keys: wave-2 updates of wave-1 keys
    # exercise the create-409 → update conflict fallback at the sink
    ev = cg.gen_change_events(2000, 80, seed=43)
    paths = cg.write_wal_chunks(ev, str(tmp_path / "wal"), num_chunks=4)
    cdc.replay(lake_dir, paths, spec, changes_dir=ch)
    ev2 = cg.gen_change_events(800, 80, seed=44, lsn_start=50_000)
    p2 = cg.write_wal_chunks(ev2, str(tmp_path / "walb"), num_chunks=2)
    cdc.replay(lake_dir, p2, spec, changes_dir=ch)
    srv, url, state = _start_sink_server()
    yield spec, lake_dir, ch, url, state, tmp_path
    srv.shutdown()


def test_sync_out_converges_and_is_exactly_once(ray_session, sink_env):
    spec, lake_dir, ch, url, state, tmp_path = sink_env
    rep = http_sink.sync_out(ch, url, ["conv_id", "turn_idx"], consumer="t1")
    assert rep["created"] + rep["updated"] + rep["deleted"] > 0
    assert rep["retries"] >= state["n_503"] > 0  # 503s really happened + retried
    assert rep["conflicts"] > 0  # update events hit create-409 → update path
    assert rep["dup_skipped"] == 0

    want = {k: _normalize(v) for k, v in _feed_oracle(ch).items()}
    assert state["records"] == want

    # cursor committed: rerun sends nothing
    rep2 = http_sink.sync_out(ch, url, ["conv_id", "turn_idx"], consumer="t1")
    assert rep2 == {"files": 0, "partitions": 0}


def test_duplicate_delivery_deduped_by_idempotency_keys(ray_session, sink_env):
    """Crash-before-cursor-commit window: the whole feed is delivered
    TWICE. The server's idempotency-token dedupe absorbs the second pass —
    zero re-applies, state unchanged."""
    spec, lake_dir, ch, url, state, tmp_path = sink_env
    http_sink.sync_out(ch, url, ["conv_id", "turn_idx"], consumer="t2")
    snapshot = dict(state["records"])

    os.unlink(os.path.join(ch, "_cursor-t2.json"))  # "crashed before commit"
    versions_before = dict(state["versions"])
    rep = http_sink.sync_out(ch, url, ["conv_id", "turn_idx"], consumer="t2")
    # nothing re-applies: every event is stale under the version guard —
    # including old deletes redelivered AFTER a newer upsert (the
    # order-inversion hazard the guard exists for)
    assert rep["created"] == rep["updated"] == rep["deleted"] == 0
    assert rep["dup_skipped"] > 0
    assert state["versions"] == versions_before
    assert state["records"] == snapshot

    # a FURTHER replay's new events still flow through after the dup storm
    ev2 = cg.gen_change_events(500, 80, seed=91, lsn_start=100_000)
    p2 = cg.write_wal_chunks(ev2, str(tmp_path / "wal2"), num_chunks=2)
    cdc.replay(lake_dir, p2, spec, changes_dir=ch)
    rep3 = http_sink.sync_out(ch, url, ["conv_id", "turn_idx"], consumer="t2")
    assert rep3["created"] + rep3["updated"] + rep3["deleted"] > 0
    want = {k: _normalize(v) for k, v in _feed_oracle(ch).items()}
    assert state["records"] == want


def test_post_error_after_retry_exhaustion(tmp_path):
    """A permanently-down endpoint exhausts the bounded retries loudly —
    and the cursor does NOT move (the next run re-sends)."""
    spec = transcripts_spec()
    lake_dir = str(tmp_path / "lake")
    ch = str(tmp_path / "ch")
    cdc.init_lake(cg.gen_transcripts(10, seed=1), lake_dir, spec, num_partitions=2)
    ev = cg.gen_change_events(50, 10, seed=2)
    cdc.replay(
        lake_dir, cg.write_wal_chunks(ev, str(tmp_path / "wal"), 1), spec,
        changes_dir=ch,
    )
    with pytest.raises(http_sink.PostError):
        http_sink.sync_out(
            ch, "http://127.0.0.1:1", ["conv_id", "turn_idx"],
            consumer="t3", max_retries=2, backoff_s=0.0, timeout_s=0.2,
        )
    assert not os.path.exists(os.path.join(ch, "_cursor-t3.json"))
