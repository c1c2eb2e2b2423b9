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


def test_streaming_tier_matches_name_heuristic():
    """queries.STREAMING_QUERIES must be exactly the registry entries
    whose names say they stream — a new streaming query added without
    tier registration (or a stale entry) fails here, keeping the
    certify --tier partition exhaustive."""
    from kickstarter_etl_pipeline_spark.queries import STREAMING_QUERIES, queries

    names = set(queries())
    assert STREAMING_QUERIES <= names, sorted(STREAMING_QUERIES - names)
    heuristic = {
        n
        for n in names
        if "stream" in n or "tws" in n or "stateful" in n
    }
    assert STREAMING_QUERIES == heuristic, (
        sorted(STREAMING_QUERIES ^ heuristic)
    )


def test_three_way_shard_merge_equals_unsharded(spark, tmp_path):
    """VERDICT r13 task 6: the 3-way shard sweep must merge
    byte-identically (modulo timings) to the unsharded run — proven
    before the registry forces the move past 2-way."""
    only = [
        "dim_state",
        "dim_category",
        "region_rollup",
        "distinct_counts",
        "group_count_ordered",
        "topk_customers",
        "shipping_priority",
    ]
    single = certify(SF_SMOKE, None, only=only)
    shard_paths = []
    for i in range(3):
        p = tmp_path / f"shard3_{i}.json"
        certify(SF_SMOKE, str(p), only=only, shard=(i, 3))
        shard_paths.append(str(p))
    merged = merge_shards(shard_paths, None)
    assert _strip_timings(merged) == _strip_timings(single)
    assert list(merged["results"]) == list(single["results"])


def test_tier_split_is_disjoint_exhaustive_and_merges(spark, tmp_path):
    """VERDICT r13 task 5: --tier batch + --tier streaming partition the
    registry, and their outputs merge to the same structure as one
    unsharded run over the union (probed on a small mixed subset: two
    batch queries + one real streaming query)."""
    import copy as _copy

    from kickstarter_etl_pipeline_spark.queries import STREAMING_QUERIES, queries

    names = set(queries())
    assert STREAMING_QUERIES < names  # proper subset: batch tier non-empty

    only = ["dim_state", "region_rollup", "events_stream_tumbling"]
    single = certify(SF_SMOKE, None, only=only)

    pb = tmp_path / "tier_batch.json"
    ps = tmp_path / "tier_stream.json"
    b = certify(SF_SMOKE, str(pb), only=only, tier="batch")
    st = certify(SF_SMOKE, str(ps), only=only, tier="streaming")
    assert set(b["results"]) == {"dim_state", "region_rollup"}
    assert set(st["results"]) == {"events_stream_tumbling"}

    merged = merge_shards([str(pb), str(ps)], None)

    def _strip(o):
        o = _copy.deepcopy(_strip_timings(o))
        o["summary"].pop("tier", None)
        return o

    assert _strip(merged) == _strip(single)
