"""The bench degraded path: when the axon tunnel is down at bench time the
driver must still receive ONE valid JSON artifact line (stale, clearly
labeled) instead of a hung process it records as nothing. Pure-host logic —
no jax backend is touched."""

import contextlib
import io
import json

import bench


def _emit(cache, why="tunnel down (test)"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit_stale_artifact(cache, why)
    return json.loads(buf.getvalue())


def test_stale_artifact_prefers_cached_run():
    art = _emit({"last_artifact": {
        "value": {"metric": "m", "value": 300.9, "unit": "clips/s",
                  "vs_baseline": 2.5, "detail": {}},
        "at_unix": 0}})
    assert art["value"] == 300.9
    assert "most recent on-chip" in art["detail"]["stale"]
    # machine-readable: a consumer of the top-level schema must be able to
    # tell a replay from a fresh measurement without parsing detail prose
    assert art["stale"] is True
    assert art["measured_at_unix"] == 0


def test_stale_artifact_falls_back_to_committed_round():
    art = _emit({})
    # the newest committed BENCH_r*.json, replayed with provenance
    assert art["value"] > 0
    assert art["unit"] == "clips/s"
    assert "PREVIOUS round" in art["detail"]["stale"]
    assert art["stale"] is True


def test_stale_artifact_carries_the_real_cause():
    # a headline failure must never masquerade as a tunnel outage
    art = _emit({"last_artifact": {
        "value": {"metric": "m", "value": 1.0, "unit": "clips/s",
                  "vs_baseline": 0.01, "detail": {}}, "at_unix": 0}},
        why="bench headline FAILED on-chip (OOM) — investigate")
    assert "FAILED on-chip" in art["detail"]["stale"]
    assert "tunnel" not in art["detail"]["stale"]


def test_stale_artifact_survives_schema_mismatched_cache():
    # a corrupt/old-schema cache must fall through, not crash the one
    # path that must always emit a JSON line
    art = _emit({"last_artifact": {"bogus": True}})
    assert art["value"] > 0  # fell through to the committed round artifact
    assert "PREVIOUS round" in art["detail"]["stale"]


def test_bench_round_key_sorts_numerically():
    paths = ["BENCH_r3.json", "BENCH_r10.json", "BENCH_r02.json"]
    newest = max(paths, key=bench._bench_round_key)
    assert newest == "BENCH_r10.json"


def test_stale_artifact_keeps_driver_schema():
    for cache in ({}, {"last_artifact": {
            "value": {"metric": "m", "value": 1.0, "unit": "clips/s",
                      "vs_baseline": 0.01, "detail": {}}, "at_unix": 0}}):
        art = _emit(cache)
        for key in ("metric", "value", "unit", "vs_baseline", "detail",
                    "stale", "measured_at_unix"):
            assert key in art
        assert art["stale"] is True
