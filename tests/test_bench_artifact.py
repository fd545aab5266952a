"""The bench degraded path: when the axon tunnel is down at bench time the
driver must still receive ONE valid JSON artifact line (stale, clearly
labeled) instead of a hung process it records as nothing. Pure-host logic —
no jax backend is touched."""

import contextlib
import io
import json

import pytest

import bench


@pytest.fixture(autouse=True)
def _sidecar_in_tmp(tmp_path, monkeypatch):
    # tests must not write the real repo-root BENCH_DETAIL.json
    monkeypatch.setattr(bench, "DETAIL_SIDECAR_PATH",
                        str(tmp_path / "BENCH_DETAIL.json"))


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


def _fat_artifact():
    """A fresh-run artifact with round-4-scale detail (the real r4 stdout
    line grew to 2,443 chars and the driver recorded `parsed: null`)."""
    detail = {
        "batch": 512, "headline_path": "int8-W8A8",
        "per_batch_clips_per_sec": {"512": 301.08},
        "int8_clips_per_sec": 301.08, "rel_err_bf16": 0.00939,
        "rel_err_q8": 0.02454, "q8_mean_joint_disp": 0.00281,
        "q8_rel_err_gate": 0.05,
        "task_gate_mpjpe": {"anchor": "random-init", "fp32_mpjpe_mm": 1108.2,
                            "gate_mm": 11.08, "bf16_mpjpe_delta_mm": 0.027,
                            "bf16_pass": True, "q8_mpjpe_delta_mm": 2.33,
                            "q8_pass": True},
        "serving_latency_ms_batch1": 27.2, "train_clips_per_sec": 67.11,
        "action_train_clips_per_sec": 29.6,
        "mesh_train_clips_per_sec": 702.46,
        "serving_clips_per_sec_concurrent": 151.22,
        "serving_avg_batch_concurrent": 44.31,
        "lite_clips_per_sec": 348.56,
        "dtype": "int8 W8A8 (bf16 activations)",
        "attn": "pallas-fused-pair-q8", "achieved_tflops": 111.4,
        "mfu_vs_chip_peak": 0.758,
        "k512_sustained_tflops_range": [115.0, 125.0],
        "mfu_vs_k512_ceiling": 0.928,
        "chip_bf16_tflops_observed_range": [116.0, 165.2],
        "int8_vs_bf16_at_kernel_shapes": {
            "544x512x1536 (flattened spatial)": 0.82,
            "486x512x1536 (flattened temporal)": 1.01,
            "2048x512x1536": 1.14, "2048x2048x2048": 1.38,
            "4096x4096x4096": 1.76},
        "stream_kernel_verdict": {
            "verdict": "rejected-slower",
            "bf16_ms_stream_vs_pair": [48.59, 44.10],
            "q8_ms_stream_vs_pair": [45.36, 42.36],
            "onchip_rel_err_vs_pair": [0.00057, 0.0014],
            "task_gate_q8_stream_mpjpe_delta_mm": 2.3136,
            "measured": "r4 tools/probe_stream (opt-in: --stream)"},
        "kernel_parity": "pass",
        "kernel_parity_detail": {
            k: {"fwd_max_diff": 0.03, "fwd_vs_fp32": 0.02, "out_max": 4.6,
                "bwd_vs_fp32": 2.2, "grad_max": 469.0}
            for k in ("pair_spatial", "pair_temporal", "gated_pair")},
        "device": "TPU v5 lite0",
        "baseline_estimate_a100_clips_per_sec": 120.0,
        "vs_baseline_range": {"80": 3.764, "120": 2.509, "240": 1.255},
        "target_vs_baseline": 5.0,
    }
    return {"metric": "243-frame clips/sec/chip (pose3d lift)",
            "value": 301.08, "unit": "clips/s", "vs_baseline": 2.509,
            "stale": False, "measured_at_unix": 1755000000,
            "detail": detail}


def _emit_fresh(artifact):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit_artifact(artifact)
    return buf.getvalue()


def test_driver_tail_capture_parses_fat_fresh_artifact():
    """Simulate the driver: it keeps only the LAST ~2,000 chars of bench
    stdout and json.loads them. The compact line must fit and parse, with
    the full detail preserved in the sidecar (VERDICT r4 #1)."""
    out = _emit_fresh(_fat_artifact())
    assert out.count("\n") == 1  # ONE line
    line = out.strip()
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    art = json.loads(line[-2000:])  # the driver's tail window
    for key in ("metric", "value", "unit", "vs_baseline", "stale",
                "measured_at_unix", "detail"):
        assert key in art
    assert art["value"] == 301.08
    # headline provenance + the task-metric gate verdicts stay on stdout
    assert art["detail"]["headline_path"] == "int8-W8A8"
    assert art["detail"]["gate_q8_pass"] is True
    assert art["detail"]["gate_anchor"] == "random-init"
    # ... and the sidecar holds everything
    with open(bench.DETAIL_SIDECAR_PATH) as f:
        side = json.load(f)
    assert side["detail"]["int8_vs_bf16_at_kernel_shapes"]
    assert side["detail"]["stream_kernel_verdict"]["verdict"] == \
        "rejected-slower"
    assert side["stdout_line"] == art


def test_driver_tail_capture_parses_degraded_artifact():
    """The degraded/stale replay path must honor the same line budget:
    the cached last_artifact carries the full fat detail."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit_stale_artifact(
            {"last_artifact": {"value": _fat_artifact(), "at_unix": 0}},
            "TPU backend unreachable at bench time (axon tunnel down)")
    line = buf.getvalue().strip()
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    art = json.loads(line[-2000:])
    assert art["stale"] is True
    assert "tunnel down" in art["detail"]["stale"]
    with open(bench.DETAIL_SIDECAR_PATH) as f:
        side = json.load(f)
    assert "most recent on-chip" in side["detail"]["stale"]


def test_line_budget_survives_pathological_detail():
    """Even a detail blob full of long strings must not push the stdout
    line past the driver window — drop keys, keep schema."""
    art = _fat_artifact()
    art["detail"]["stale"] = "x" * 5000
    line = _emit_fresh(art).strip()
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    parsed = json.loads(line[-2000:])
    assert parsed["metric"]
    assert parsed["detail"]["file"] == "BENCH_DETAIL.json"


def test_stale_artifact_keeps_driver_schema():
    for cache in ({}, {"last_artifact": {
            "value": {"metric": "m", "value": 1.0, "unit": "clips/s",
                      "vs_baseline": 0.01, "detail": {}}, "at_unix": 0}}):
        art = _emit(cache)
        for key in ("metric", "value", "unit", "vs_baseline", "detail",
                    "stale", "measured_at_unix"):
            assert key in art
        assert art["stale"] is True
