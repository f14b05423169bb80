"""Deterministic synthetic transcripts + change-event ("WAL tail") generator.

Fixture generator per ``/root/repo/FIXTURES.md`` (T1/T2/T3/T4), mirroring the
reference's deterministic dummy-record corpus
(``/root/reference/tests/data/users_src.json``, selected at
``/root/reference/bcdc2bcdc/constants.py:124-125``) scaled up and fully
vectorized (numpy, fixed seed) so bench-scale streams (10^6–10^7 events
in-sandbox, standing in for the 10^10 target) generate in seconds.

Also holds the pure-Python oracle replay (`oracle_replay`): a trivial dict
keyed by (conv_id, turn_idx) taking the max-LSN event per key — the ground
truth every engine test compares against (FIXTURES.md "Oracle & invariants").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .spec import CHANGE_EVENT_SCHEMA, TRANSCRIPTS_SCHEMA

_VOCAB = (
    "the quick brown fox data spark ray arrow parquet lake merge delta stream "
    "batch shuffle hash key turn conversation agent tool model reply question "
    "answer context token window sort scan join filter group count state log"
).split()

_TOOLS = [
    "search", "calculator", "browser", "python", "sql", "editor", "shell", "retrieval",
]

_BASE_TS_US = np.int64(1767225600000000)  # 2026-01-01T00:00:00Z in microseconds


def _make_texts(rng: np.random.Generator, n: int, tag: np.ndarray) -> pd.Series:
    """Deterministic token-soup texts: a base sentence from a fixed pool plus a
    row-unique tag so texts differ across rows but are reproducible."""
    pool_size = 512
    pool = np.array(
        [
            " ".join(
                np.array(_VOCAB)[rng.integers(0, len(_VOCAB), rng.integers(5, 24))]
            )
            for _ in range(pool_size)
        ]
    )
    base = pool[rng.integers(0, pool_size, n)]
    return pd.Series(base) + " #" + pd.Series(tag).astype(str)


def _zipf_conv_ids(rng: np.random.Generator, n: int, n_convs: int) -> np.ndarray:
    """Zipf(1.1)-skewed conversation indices — a few conversations are hot
    (skew/salting tests, FIXTURES.md T1)."""
    z = rng.zipf(1.1, size=n)
    return (z - 1) % n_convs


def gen_transcripts(n_convs: int = 50, seed: int = 42) -> pa.Table:
    """T1 — the initial lake state: one row per (conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)
    lens = np.minimum(1 + rng.poisson(6, n_convs), 40)
    conv_idx = np.repeat(np.arange(n_convs), lens)
    n = len(conv_idx)
    turn_idx = np.concatenate([np.arange(l) for l in lens]).astype(np.int32)

    conv_id = pd.Series(conv_idx).map(lambda i: f"conv-{i:08d}").to_numpy()
    role_draw = rng.random(n)
    role = np.where(
        role_draw < 0.05,
        "system",
        np.where(role_draw < 0.15, "tool", np.where(turn_idx % 2 == 0, "user", "assistant")),
    )
    text = _make_texts(rng, n, conv_idx * 1000 + turn_idx).to_numpy()
    # edge cases: some falsy forms ('' / 'None') that canonicalize to null
    falsy = rng.random(n)
    text = np.where(falsy < 0.01, "", np.where(falsy < 0.02, "None", text))
    tool = np.where(
        role == "tool", np.array(_TOOLS)[rng.integers(0, len(_TOOLS), n)], None
    )
    ts = _BASE_TS_US + conv_idx.astype(np.int64) * 3_600_000_000 + turn_idx.astype(
        np.int64
    ) * 60_000_000

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def gen_change_events(
    n_events: int,
    n_convs: int,
    seed: int = 43,
    lsn_start: int = 1,
    delete_frac: float = 0.10,
    noop_frac: float = 0.05,
    dup_frac: float = 0.02,
    max_turn: int = 48,
    evolved: bool = False,
) -> pa.Table:
    """T2 — LSN-ordered change events with hot-key skew, repeated keys across
    the stream (last-writer-wins tests), and duplicate (lsn,key) replays
    (idempotence tests).

    ``evolved=True`` produces the T3 schema-evolution variant: adds a
    nullable ``lang`` column and widens ``turn_idx`` to int64 (the analog of
    the reference's data_type_enforcement widening,
    ``/root/reference/bcdc2bcdc/CKANData.py:966-1022``).
    """
    rng = np.random.default_rng(seed)
    n = n_events
    if n == 0:
        # zero-length numpy intermediates lose their dtypes (empty map →
        # int64): build the empty table straight from the schema
        fields = [
            ("lsn", pa.int64()), ("op", pa.string()), ("conv_id", pa.string()),
            ("turn_idx", pa.int64() if evolved else pa.int32()),
            ("role", pa.string()), ("text", pa.string()),
            ("tool", pa.string()), ("ts", pa.timestamp("us")),
        ] + ([("lang", pa.string())] if evolved else [])
        return pa.table({name: pa.array([], typ) for name, typ in fields})
    lsn = np.arange(lsn_start, lsn_start + n, dtype=np.int64)

    conv_idx = _zipf_conv_ids(rng, n, int(n_convs * 1.3) + 1)  # ~30% beyond lake → ADDs
    conv_id = pd.Series(conv_idx).map(lambda i: f"conv-{i:08d}").to_numpy()
    turn_idx = rng.integers(0, max_turn, n).astype(np.int64 if evolved else np.int32)

    op_draw = rng.random(n)
    op = np.where(op_draw < delete_frac, "delete", "upsert")

    role_draw = rng.random(n)
    role = np.where(
        role_draw < 0.05,
        "system",
        np.where(role_draw < 0.15, "tool", np.where(turn_idx % 2 == 0, "user", "assistant")),
    )
    text = _make_texts(rng, n, lsn).to_numpy(dtype=object)
    # a slice of upserts send a KEY-STABLE payload (text a pure function of
    # the key, role/tool fixed): any repeat of such an event for the same key
    # must be classified NOOP via content hash (D4,
    # /root/reference/bcdc2bcdc/CKANData.py:307-313,1455).
    stable = rng.random(n) < noop_frac
    ts = _BASE_TS_US + np.int64(10_000_000_000) + lsn * 1_000_000
    if stable.any():
        stbl_txt = (
            "stable " + pd.Series(conv_id) + "/" + pd.Series(turn_idx).astype(str)
        ).to_numpy(dtype=object)
        text = np.where(stable, stbl_txt, text)
        role = np.where(stable, "user", role)
        # stable events are true echoes: ts is a function of the key too, so
        # a repeat is byte-identical → NOOP via content hash
        stbl_ts = _BASE_TS_US + (conv_idx * 1000 + turn_idx).astype(np.int64) * 1_000_000
        ts = np.where(stable, stbl_ts, ts)
    text[op == "delete"] = None
    tool = np.where(role == "tool", np.array(_TOOLS)[rng.integers(0, len(_TOOLS), n)], None)

    cols = {
        "lsn": pa.array(lsn, pa.int64()),
        "op": pa.array(op, pa.string()),
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int64() if evolved else pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }
    if evolved:
        langs = np.array(["en", "fr", "de", "es", "zh"])
        cols["lang"] = pa.array(
            np.where(rng.random(n) < 0.2, None, langs[rng.integers(0, 5, n)]),
            pa.string(),
        )
    t = pa.table(cols)

    # duplicate (lsn, key) replays: append exact copies of a random slice —
    # exactly-once / idempotence fixture property.
    if dup_frac > 0 and n > 0:
        k = max(1, int(n * dup_frac))
        idx = np.sort(rng.choice(n, size=k, replace=False))
        t = pa.concat_tables([t, t.take(idx)]).sort_by("lsn")
    return t


def write_wal_chunks(events: pa.Table, out_dir: str, num_chunks: int = 8) -> list[str]:
    """Write the event table as K ordered parquet chunks (the tailed WAL).
    Events for one key deliberately span chunks (cross-block grouping test)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n = events.num_rows
    paths = []
    bounds = np.linspace(0, n, num_chunks + 1).astype(int)
    for i in range(num_chunks):
        lo, hi = bounds[i], bounds[i + 1]
        if hi <= lo:
            continue
        p = os.path.join(out_dir, f"wal-{i:05d}.parquet")
        pq.write_table(events.slice(lo, hi - lo), p)
        paths.append(p)
    return paths


def gen_wal_chunks(
    n_events: int,
    n_convs: int,
    out_dir: str,
    num_chunks: int = 8,
    seed: int = 43,
    lsn_offset: int = 0,
    **kwargs,
) -> list[str]:
    """Generate + write the WAL chunk-by-chunk, never holding more than one
    chunk in memory. Required beyond ~10M events: a single driver-side table
    of 32M ~100-byte strings overflows Arrow's int32 string offsets in
    take/sort, and a generator that scales to the 10^10-event regime must be
    streaming anyway. Each chunk gets a disjoint ascending LSN range, so the
    concatenated chunks are one valid ordered WAL."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, n_events, num_chunks + 1).astype(int)
    paths = []
    for i in range(num_chunks):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        chunk = gen_change_events(
            hi - lo, n_convs, seed=seed + i, lsn_start=lsn_offset + lo + 1, **kwargs
        )
        p = os.path.join(out_dir, f"wal-{i:05d}.parquet")
        pq.write_table(chunk, p)
        paths.append(p)
    return paths


TOOLS_SCHEMA = pa.schema(
    [
        ("tool_id", pa.string()),
        ("dest_name", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def gen_tool_dim() -> pa.Table:
    """Initial tools dimension table (the small 'users/groups' analog that
    must merge BEFORE the fact table — reference FK ordering,
    ``/root/reference/bin/runBCDC2BCDC.py:286-289``)."""
    return pa.table(
        {
            "tool_id": pa.array(list(_TOOLS), pa.string()),
            "dest_name": pa.array([f"pending-{t}" for t in _TOOLS], pa.string()),
            "ts": pa.array(
                np.full(len(_TOOLS), _BASE_TS_US, np.int64), pa.timestamp("us")
            ),
        }
    )


def gen_tool_events(n_events: int = 64, lsn_start: int = 1) -> pa.Table:
    """Deterministic upsert-only change events for the tools dimension:
    each tool's dest_name is rewritten several times; the max-LSN upsert
    wins (LWW), so the final dimension state — and the id-remap LUT derived
    from it (``DataCache.py:143-189`` addData) — is a pure function of this
    stream."""
    lsn = np.arange(lsn_start, lsn_start + n_events, dtype=np.int64)
    tools = np.array(_TOOLS)[(lsn - lsn_start) % len(_TOOLS)]
    dest = np.array([f"dst-{t}-{l}" for t, l in zip(tools, lsn)], dtype=object)
    return pa.table(
        {
            "lsn": pa.array(lsn, pa.int64()),
            "op": pa.array(["upsert"] * n_events, pa.string()),
            "tool_id": pa.array(tools, pa.string()),
            "dest_name": pa.array(dest, pa.string()),
            "ts": pa.array(_BASE_TS_US + lsn * 1_000_000, pa.timestamp("us")),
        }
    )


def final_tool_lut(dim: pa.Table, events: pa.Table) -> dict:
    """Dict-oracle LWW over the dim stream: tool_id → final dest_name."""
    lut = dict(zip(dim.column("tool_id").to_pylist(), dim.column("dest_name").to_pylist()))
    ev = sorted(events.to_pylist(), key=lambda r: r["lsn"])
    for r in ev:
        lut[r["tool_id"]] = r["dest_name"]
    return lut


def oracle_replay(
    lake: pa.Table,
    events: pa.Table,
    ignore_keys: frozenset = frozenset(),
) -> pa.Table:
    """Ground-truth replay: plain dict keyed by (conv_id, turn_idx), max-LSN
    wins; deletes remove; ignored conv_ids are untouched by any event.

    Single-threaded and row-at-a-time ON PURPOSE — this is the test oracle,
    never the engine (FIXTURES.md "Oracle & invariants").
    """
    def _canon(v):
        return None if v in ("", "None") else v

    def _comparable(d: dict) -> tuple:
        # same comparison the engine hashes: all non-key payload columns,
        # falsy-canonicalized text/tool (spec.transcripts_spec semantics).
        return tuple(
            _canon(d.get(c)) if c in ("text", "tool") else d.get(c)
            for c in lake.column_names
            if c not in ("conv_id", "turn_idx")
        )

    state: dict[tuple, dict] = {}
    for row in lake.to_pylist():
        state[(row["conv_id"], row["turn_idx"])] = {**row, "__lsn": -1}

    ev = events.to_pylist()
    ev.sort(key=lambda r: r["lsn"])
    for r in ev:
        if r["conv_id"] in ignore_keys:
            continue
        k = (r["conv_id"], r["turn_idx"])
        prev_lsn = state.get(k, {}).get("__lsn", -1)
        if r["lsn"] < prev_lsn:
            continue
        if r["op"] == "delete":
            state.pop(k, None)
            continue
        payload = {c: r.get(c) for c in lake.column_names}
        payload["conv_id"], payload["turn_idx"] = k
        if k in state and _comparable(state[k]) == _comparable(payload):
            continue  # NOOP — content-hash suppression keeps the current row
        state[k] = {**payload, "__lsn": r["lsn"]}

    rows = sorted(state.values(), key=lambda d: (d["conv_id"], d["turn_idx"]))
    for d in rows:
        d.pop("__lsn", None)
    if not rows:
        return lake.slice(0, 0)
    out = pa.Table.from_pylist(rows)
    return out.select(lake.column_names).cast(lake.schema)
