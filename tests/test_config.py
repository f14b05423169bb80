"""Declarative TableSpec loading + by-name hook registry (config.py) —
the reference's JSON TransformationConfig + CustomTransformers methodMapping
with bind-time validation (CKANTransform.py:65-141, CustomTransformers.py:35-98).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from bcdc2bcdc_ray import changegen as cg
from bcdc2bcdc_ray import config
from bcdc2bcdc_ray.spec import TRANSCRIPTS_SCHEMA, TableSpec, transcripts_spec

TRANSCRIPTS_CONFIG = {
    "name": "transcripts",
    "key": ["conv_id", "turn_idx"],
    "schema": {
        "conv_id": "string",
        "turn_idx": "int32",
        "role": "string",
        "text": "string",
        "tool": "string",
        "ts": "timestamp[us]",
    },
    "compare_columns": ["role", "text", "tool", "ts"],
    "falsy_null_columns": ["text", "tool"],
}


def test_arrow_type_vocabulary():
    assert config.arrow_type("string") == pa.string()
    assert config.arrow_type("timestamp[us]") == pa.timestamp("us")
    assert config.arrow_type("list<int64>") == pa.list_(pa.int64())
    nested = config.arrow_type("list<struct<user:string, n:int32>>")
    assert nested == pa.list_(
        pa.struct([("user", pa.string()), ("n", pa.int32())])
    )
    with pytest.raises(ValueError, match="unknown type string"):
        config.arrow_type("varchar")


def test_spec_from_dict_matches_python_spec():
    spec = config.spec_from_dict(TRANSCRIPTS_CONFIG)
    ref = transcripts_spec()
    assert spec.schema == TRANSCRIPTS_SCHEMA
    assert spec.key == ref.key
    assert spec.compare_columns == ref.compare_columns
    assert spec.falsy_null_columns == ref.falsy_null_columns


def test_unknown_hook_name_fails_at_bind_time():
    cfg = dict(TRANSCRIPTS_CONFIG, on_compare=["definitely_not_a_hook"])
    with pytest.raises(ValueError, match="unknown hook 'definitely_not_a_hook'"):
        config.spec_from_dict(cfg)
    # the error lists the registered vocabulary (the reference raises its
    # valid methodMapping keys the same way)
    with pytest.raises(ValueError, match="value_map"):
        config.spec_from_dict(cfg)


def test_bad_hook_args_fail_at_bind_time():
    cfg = dict(
        TRANSCRIPTS_CONFIG,
        on_compare=[{"hook": "value_map", "args": {"nope": 1}}],
    )
    with pytest.raises(ValueError, match="does not accept args"):
        config.spec_from_dict(cfg)


def test_schema_column_validation():
    with pytest.raises(ValueError, match="key column"):
        config.spec_from_dict(dict(TRANSCRIPTS_CONFIG, key=["missing_col"]))
    with pytest.raises(ValueError, match="unknown config keys"):
        config.spec_from_dict(dict(TRANSCRIPTS_CONFIG, typo_key=1))


def test_register_hook_rejects_duplicates():
    with pytest.raises(ValueError, match="already registered"):
        config.register_hook("value_map", lambda b: b)


def test_load_spec_json_and_multi_table(tmp_path):
    single = tmp_path / "t.json"
    single.write_text(json.dumps(TRANSCRIPTS_CONFIG))
    assert config.load_spec(str(single)).name == "transcripts"

    multi = tmp_path / "m.json"
    other = dict(TRANSCRIPTS_CONFIG, name="other")
    multi.write_text(json.dumps({"tables": [TRANSCRIPTS_CONFIG, other]}))
    with pytest.raises(ValueError, match="pass table="):
        config.load_spec(str(multi))
    assert config.load_spec(str(multi), table="other").name == "other"
    specs = config.load_specs(str(multi))
    assert sorted(specs) == ["other", "transcripts"]


def test_config_spec_replays_flagship_to_oracle(ray_session, tmp_path):
    """A config-file-declared transcripts spec replays the fixture to the
    same final state as the Python-built spec's oracle — config-driven
    tables run the identical pipeline."""
    from bcdc2bcdc_ray.pipelines import cdc

    cfg = tmp_path / "transcripts.json"
    cfg.write_text(json.dumps(TRANSCRIPTS_CONFIG))
    spec = config.load_spec(str(cfg))

    lake_dir, wal_dir = str(tmp_path / "lake"), str(tmp_path / "wal")
    lake = cg.gen_transcripts(100, seed=42)
    cdc.init_lake(lake, lake_dir, spec, num_partitions=8)
    events = cg.gen_change_events(2500, 100, seed=43)
    paths = cg.write_wal_chunks(events, wal_dir, num_chunks=4)
    cdc.replay(lake_dir, paths, spec)
    assert cdc.read_lake_table(lake_dir).equals(cg.oracle_replay(lake, events))
    # exactly-once on rerun under the config-loaded spec
    rep = cdc.replay(lake_dir, paths, spec)
    assert rep["adds"] + rep["updates"] + rep["deletes"] == 0


def test_config_hook_applies_in_replay(ray_session, tmp_path):
    """A config-declared on_compare hook (value_map on ``tool``) transforms
    the replayed lake exactly like the equivalent Python-built spec."""
    from bcdc2bcdc_ray.pipelines import cdc
    from bcdc2bcdc_ray.stages import transforms

    mapping = {"search": "SEARCH", "calc": "CALC"}
    cfg = dict(
        TRANSCRIPTS_CONFIG,
        name="transcripts_cfg_hook",
        on_compare=[{"hook": "value_map", "args": {"col": "tool", "mapping": mapping}}],
    )
    spec = config.spec_from_dict(cfg)

    def hook(b):
        return transforms.value_map(b, "tool", mapping)

    lake = hook(cg.gen_transcripts(60, seed=7))
    events = cg.gen_change_events(1200, 60, seed=8)
    lake_dir, wal_dir = str(tmp_path / "lake"), str(tmp_path / "wal")
    cdc.init_lake(lake, lake_dir, spec, num_partitions=4)
    paths = cg.write_wal_chunks(events, wal_dir, num_chunks=3)
    cdc.replay(lake_dir, paths, spec)
    final = cdc.read_lake_table(lake_dir)
    assert final.equals(cg.oracle_replay(lake, hook(events)))
    tools = set(final.column("tool").to_pylist()) - {None}
    assert not (tools & set(mapping))  # every mapped value rewritten
