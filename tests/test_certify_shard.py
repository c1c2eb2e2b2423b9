"""Certify sharding contract (r12, VERDICT r11 task 3).

The full-registry certification sweep is ~330 s at 309 queries; the
``--shard I/N`` flag lets N processes sharing only the parquet inputs
split the sweep. The contract pinned here: shards are deterministic,
disjoint, jointly exhaustive, and ``--merge`` reproduces the unsharded
output byte-identically modulo the timing fields.
"""

from __future__ import annotations

import copy
import json
import os

import pytest

from kickstarter_etl_pipeline_spark.certify import (
    _parse_shard,
    _shard_names,
    certify,
    merge_shards,
)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")


def test_shard_names_partition_is_disjoint_and_exhaustive():
    names = [f"q{i:03d}" for i in range(309)]
    for n in (1, 2, 3, 7):
        parts = [_shard_names(names, (i, n)) for i in range(n)]
        flat = [x for p in parts for x in p]
        assert sorted(flat) == names
        assert len(flat) == len(set(flat))
        # balanced within 1
        sizes = {len(p) for p in parts}
        assert max(sizes) - min(sizes) <= 1
    assert _shard_names(names, None) == names


def test_parse_shard_validates():
    assert _parse_shard("0/2") == (0, 2)
    assert _parse_shard("3/4") == (3, 4)
    for bad in ("2/2", "-1/2", "x/2", "1"):
        with pytest.raises(SystemExit):
            _parse_shard(bad)


def _strip_timings(out: dict) -> dict:
    out = copy.deepcopy(out)
    out["summary"].pop("wall_sec", None)
    out["summary"].pop("shard", None)
    for rec in out["results"].values():
        rec.pop("sec", None)
    return out


def test_sharded_merge_equals_unsharded(spark, tmp_path):
    """End-to-end: two shards over a 5-query subset, merged, must equal
    the single unsharded run modulo timings — the VERDICT r11 task-3
    Done criterion at fixture scale. (certify() reuses the session via
    getOrCreate, so this runs in-process.)"""
    only = [
        "dim_state",
        "dim_category",
        "region_rollup",
        "distinct_counts",
        "group_count_ordered",
    ]
    single = certify(SF_SMOKE, None, only=only)
    shard_paths = []
    for i in range(2):
        p = tmp_path / f"shard{i}.json"
        certify(SF_SMOKE, str(p), only=only, shard=(i, 2))
        shard_paths.append(str(p))
    merged_path = tmp_path / "merged.json"
    merged = merge_shards(shard_paths, str(merged_path))
    assert _strip_timings(merged) == _strip_timings(single)
    assert single["summary"]["match"] == 5
    # merged file on disk round-trips to the same structure
    assert _strip_timings(json.load(open(merged_path))) == _strip_timings(single)
    # key ORDER in the merged results matches the unsharded sweep
    assert list(merged["results"]) == list(single["results"])


def test_merge_rejects_overlapping_shards(tmp_path):
    rec = {"status": "MATCH", "rows": 1, "oracle_rows": 1, "err": None, "sec": 0.1}
    a = {"summary": {"sf_dir": "x", "wall_sec": 1.0}, "results": {"q1": rec}}
    b = {"summary": {"sf_dir": "x", "wall_sec": 1.0}, "results": {"q1": rec}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    with pytest.raises(SystemExit):
        merge_shards([str(pa), str(pb)], None)


def test_merge_rejects_mixed_sf_dirs(tmp_path):
    rec = {"status": "MATCH", "rows": 1, "oracle_rows": 1, "err": None, "sec": 0.1}
    a = {"summary": {"sf_dir": "x", "wall_sec": 1.0}, "results": {"q1": rec}}
    b = {"summary": {"sf_dir": "y", "wall_sec": 1.0}, "results": {"q2": rec}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    with pytest.raises(SystemExit):
        merge_shards([str(pa), str(pb)], None)
