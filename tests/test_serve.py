"""Async batching server: correctness under concurrency, bucketing,
exception propagation, clean shutdown."""

import threading
import time

import numpy as np
import pytest

from motionbert_tpu.serve import BatchingServer


def _echo_fn(batch):
    # deterministic per-row transform so results are checkable
    return batch * 2.0 + 1.0


def test_results_match_direct_calls():
    rs = np.random.RandomState(0)
    clips = [rs.randn(9, 17, 3).astype(np.float32) for _ in range(40)]
    with BatchingServer(_echo_fn, batch_buckets=(1, 8), max_wait_ms=20) as s:
        futs = [s.submit(c) for c in clips]
        for c, f in zip(clips, futs):
            np.testing.assert_allclose(f.result(timeout=10),
                                       _echo_fn(c[None])[0])


def test_concurrent_submitters_are_batched():
    rs = np.random.RandomState(1)
    n_threads, per_thread = 8, 6
    results = {}

    with BatchingServer(_echo_fn, batch_buckets=(1, 8, 32),
                        max_wait_ms=50) as s:
        def client(tid):
            for i in range(per_thread):
                c = rs.randn(9, 17, 3).astype(np.float32)
                results[(tid, i)] = (c, s.submit(c))

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for c, fut in results.values():
            np.testing.assert_allclose(fut.result(timeout=10),
                                       _echo_fn(c[None])[0])
        # with 48 concurrent same-length submits and a 50ms window, the
        # collector must have packed real batches
        assert s.stats.requests == n_threads * per_thread
        assert s.stats.avg_batch_size > 1.5


def test_mixed_lengths_grouped_by_length():
    """Different clip lengths never share a device batch (padding the time
    axis would contaminate temporal attention)."""
    seen = []

    def fn(batch):
        seen.append(batch.shape)
        return batch

    clips = [np.full((9, 2, 2), 1.0, np.float32),
             np.full((27, 2, 2), 2.0, np.float32)] * 5
    with BatchingServer(fn, batch_buckets=(1, 8, 16), max_wait_ms=50) as s:
        futs = [s.submit(c) for c in clips]
        for c, f in zip(clips, futs):
            np.testing.assert_array_equal(f.result(timeout=10), c)
    assert all(shape[1] in (9, 27) for shape in seen)


def test_bucket_padding_counts():
    with BatchingServer(_echo_fn, batch_buckets=(4,), max_wait_ms=30) as s:
        futs = [s.submit(np.zeros((5, 3), np.float32)) for _ in range(3)]
        [f.result(timeout=10) for f in futs]
    # 3 requests padded up to the only bucket (4)
    assert s.stats.batches >= 1
    assert s.stats.padded_rows >= 1


def test_exception_propagates_to_all_callers():
    def boom(batch):
        raise ValueError("device on fire")

    with BatchingServer(boom, batch_buckets=(1, 8), max_wait_ms=20) as s:
        futs = [s.submit(np.zeros((5, 3), np.float32)) for _ in range(4)]
        for f in futs:
            with pytest.raises(ValueError, match="device on fire"):
                f.result(timeout=10)


def test_shutdown_rejects_new_work_and_drains():
    s = BatchingServer(_echo_fn, batch_buckets=(1, 8), max_wait_ms=5)
    fut = s.submit(np.ones((5, 3), np.float32))
    s.shutdown()
    np.testing.assert_allclose(fut.result(timeout=10), 3.0)
    with pytest.raises(RuntimeError):
        s.submit(np.ones((5, 3), np.float32))


def test_jitted_model_through_server():
    """End-to-end with a real jitted DSTformer at test dims."""
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.models.dstformer import DSTformer

    model = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32, depth=1,
                      num_heads=2, mlp_ratio=2, num_joints=17, maxlen=27)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 9, 17, 3)))["params"]
    fn = jax.jit(lambda x: model.apply({"params": params}, x))
    rs = np.random.RandomState(2)
    clips = [rs.randn(9, 17, 3).astype(np.float32) for _ in range(6)]
    direct = np.asarray(fn(np.stack(clips)))
    with BatchingServer(fn, batch_buckets=(1, 8), max_wait_ms=30) as s:
        futs = [s.submit(c) for c in clips]
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=30), direct[i],
                                       rtol=2e-5, atol=2e-5)


def test_malformed_clip_fails_only_its_future():
    """A clip with the right length but wrong trailing shape groups (and
    fails, if fn rejects it) ALONE — the well-formed same-length requests
    in the same collection window must still resolve correctly, and the
    collector stays alive for later requests."""
    def fn(batch):
        if batch.shape[1:] != (5, 3):
            raise ValueError("wrong trailing shape")
        return batch * 2.0 + 1.0

    with BatchingServer(fn, batch_buckets=(1, 8), max_wait_ms=10) as s:
        good = np.ones((5, 3), np.float32)
        bad = np.ones((5, 4), np.float32)  # same T, mismatched shape
        f_good, f_bad = s.submit(good), s.submit(bad)
        np.testing.assert_allclose(f_good.result(timeout=10), 3.0)
        with pytest.raises(ValueError):
            f_bad.result(timeout=10)
        # server still serves after the failure
        f2 = s.submit(good)
        np.testing.assert_allclose(f2.result(timeout=10), 3.0)


def test_motionbert_server_lift_matches_api_lift():
    """MotionBERTServer.lift serves exactly api.MotionBERT.lift's defaults
    (flip-TTA + root-relative), so migrating to the server changes latency,
    not numerics."""
    import jax
    import jax.numpy as jnp

    from motionbert_tpu.api import MotionBERT
    from motionbert_tpu.models.dstformer import DSTformer
    from motionbert_tpu.serve import MotionBERTServer

    model = DSTformer(dim_in=3, dim_out=3, dim_feat=32, dim_rep=32, depth=1,
                      num_heads=2, mlp_ratio=2, num_joints=17, maxlen=27)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 9, 17, 3)))["params"]
    mb = MotionBERT(model, params, maxlen=27)
    rs = np.random.RandomState(3)
    clips = [rs.randn(9, 17, 3).astype(np.float32) for _ in range(4)]
    direct = mb.lift(np.stack(clips))
    with MotionBERTServer(mb, batch_buckets=(1, 8), max_wait_ms=30) as srv:
        futs = [srv.lift(c) for c in clips]
        for i, f in enumerate(futs):
            out = f.result(timeout=60)
            np.testing.assert_allclose(out, direct[i], rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(out[:, 0, :], 0.0)  # root-relative


def test_serving_sweep_point_stats():
    """tools/serving_sweep.sweep_point measures a closed-loop point's
    throughput and latency percentiles correctly against a stub fn (the
    on-chip tool reuses this exact plumbing, VERDICT r4 #5)."""
    import importlib
    import os
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools_dir)
    try:
        import jax
        import jax.numpy as jnp

        sweep_point = importlib.import_module("serving_sweep").sweep_point
    finally:
        sys.path.remove(tools_dir)

    calls = []

    def fwd(variables, x):  # stub "jitted fn": identity with batch record
        calls.append(int(x.shape[0]))
        return jnp.asarray(x)

    out = sweep_point(fwd, None, n_threads=6, per_thread=3, max_wait_ms=20)
    assert out["clients"] == 6 and out["requests"] == 18
    assert out["clips_per_sec"] > 0 and out["batches"] >= 1
    assert 0 < out["p50_ms"] <= out["p99_ms"]
    assert 1.0 <= out["avg_batch"] <= 6.0
    # buckets for n<=8 are (1, 6): no dispatched batch may exceed the cap
    assert max(calls) <= 6


def _planner(buckets):
    s = BatchingServer.__new__(BatchingServer)
    s._plan_memo = {}
    s._buckets = tuple(buckets)
    return s


def test_plan_chunks_pads_when_split_costs_more():
    # 44 waiting over (1,8,48): one padded 48-batch (4 pad rows) beats six
    # 8-batches (5 extra dispatches ~= 20 rows of overhead)
    assert _planner((1, 8, 48))._plan_chunks(44) == [(44, 48)]


def test_plan_chunks_splits_between_far_buckets():
    # 105 over a fine ladder: full buckets 96+8+1 (2 extra dispatches ~= 8
    # rows) beat one 192-batch carrying 87 padded rows — the r5 saturation
    # sweep's collapse case
    plan = _planner((1, 8, 16, 32, 64, 96, 192))._plan_chunks(105)
    assert plan == [(96, 96), (8, 8), (1, 1)]
    assert sum(t for t, _ in plan) == 105


def test_plan_chunks_oversized_group_splits_exactly():
    plan = _planner((1, 8, 16, 32, 64, 96, 192))._plan_chunks(200)
    assert plan == [(192, 192), (8, 8)]


def test_plan_chunks_deep_ladder_no_recursion():
    # a ladder whose top bucket exceeds Python's recursion limit used to
    # blow up the (formerly recursive) min-cost DP at full-group sizes;
    # the iterative DP must plan any n up to the top bucket
    buckets = (1, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)
    p = _planner(buckets)
    for n in (2048, 2047, 1999, 1100):
        plan = p._plan_chunks(n)
        assert sum(t for t, _ in plan) == n
        for take, bucket in plan:
            assert take <= bucket and bucket in buckets


def test_plan_chunks_covers_every_size():
    for buckets in [(1, 8, 48), (4,), (1, 8, 16, 32, 64, 96, 192)]:
        p = _planner(buckets)
        for n in range(1, 2 * max(buckets) + 3):
            plan = p._plan_chunks(n)
            assert sum(t for t, _ in plan) == n
            for take, bucket in plan:
                assert take <= bucket and bucket in buckets


def test_dispatch_uses_planned_buckets():
    # group of 9 over (1, 8, 16): planner says 8+1 (zero padding); stats
    # must show two batches and no padded rows
    rs = np.random.RandomState(7)
    clips = [rs.randn(5, 17, 3).astype(np.float32) for _ in range(9)]
    with BatchingServer(_echo_fn, batch_buckets=(1, 8, 16),
                        max_wait_ms=200) as s:
        futs = [s.submit(c) for c in clips]
        outs = [f.result(timeout=10) for f in futs]
        for c, o in zip(clips, outs):
            np.testing.assert_allclose(o, _echo_fn(c[None])[0])
        stats = s.stats
    assert stats.batches == 2
    assert stats.padded_rows == 0


def test_cancelled_future_does_not_poison_round():
    """A client cancelling its queued future (e.g. after a result timeout)
    must not fail the other requests collected in the same round or kill
    the collector."""
    done = threading.Event()

    def fn(x):
        done.wait(timeout=10)  # hold the batch until cancels land
        return np.asarray(x)

    clip = np.ones((4, 3), np.float32)
    with BatchingServer(fn, batch_buckets=(1, 4), max_wait_ms=30) as srv:
        futs = [srv.submit(clip) for _ in range(4)]
        assert futs[0].cancel()  # still queued: cancel succeeds
        done.set()
        for f in futs[1:]:  # the others must resolve normally
            np.testing.assert_allclose(f.result(timeout=30), clip)
        # and the server must still work afterwards
        np.testing.assert_allclose(srv.submit(clip).result(timeout=30), clip)


def test_invalid_buckets_and_clips_rejected():
    with pytest.raises(ValueError):
        BatchingServer(lambda x: x, batch_buckets=())
    with pytest.raises(ValueError):
        BatchingServer(lambda x: x, batch_buckets=(0, 4))
    with BatchingServer(lambda x: np.asarray(x),
                        batch_buckets=(1, 4)) as srv:
        with pytest.raises(ValueError):  # 0-d clip fails ITS caller only
            srv.submit(np.float32(1.0))
        out = srv.submit(np.ones((4, 3), np.float32)).result(timeout=30)
        assert out.shape == (4, 3)


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_shutdown_fails_undrained_futures():
    """If the collector DIES with requests still queued, shutdown() must
    not hang and the undrained futures must resolve with an error instead
    of blocking result() forever."""
    srv = BatchingServer(lambda x: np.asarray(x), batch_buckets=(1, 4),
                         max_wait_ms=5)
    clip = np.ones((4, 3), np.float32)
    srv.submit(clip).result(timeout=30)  # collector alive and serving

    def boom():  # next loop iteration kills the collector thread
        raise RuntimeError("collector killed (test)")

    srv._collect = boom
    poke = srv.submit(clip)  # wakes the worker; processed, then boom runs
    poke.result(timeout=30)
    srv._worker.join(timeout=30)
    assert not srv._worker.is_alive()
    orphan = srv.submit(clip)  # queued; nothing will ever drain it
    srv.shutdown()  # must neither hang nor leave orphan unresolved
    with pytest.raises(RuntimeError, match="before this request"):
        orphan.result(timeout=5)
    with pytest.raises(RuntimeError):
        srv.submit(clip)


@pytest.mark.slow
def test_serving_chaos_soak():
    """~15s soak: concurrent clients that cancel futures, submit malformed
    clips, and churn lengths. Every well-formed, uncancelled request must
    resolve correctly, the collector must survive, and a clean shutdown
    must leave nothing hanging."""
    stop = time.monotonic() + 15.0
    errors = []
    completed = [0] * 12  # per-thread good-result count: a client thread
    # dying from an UNEXPECTED exception (e.g. a TimeoutError from a
    # never-resolved future — the exact failure this soak exists to catch)
    # must fail the test, not silently end that thread's loop

    def strict_fn(batch):  # a real model rejects wrong trailing shapes
        if batch.shape[-1] != 3:
            raise ValueError("wrong trailing shape")
        return batch * 2.0 + 1.0

    with BatchingServer(strict_fn, batch_buckets=(1, 8, 32),
                        max_wait_ms=5) as srv:
        def client_body(tid, rng):
            roll = rng.rand()
            T = int(rng.choice([9, 27]))
            clip = rng.randn(T, 3).astype(np.float32)
            if roll < 0.05:  # malformed trailing shape: fails ALONE
                f = srv.submit(np.ones((T, 4), np.float32))
                try:
                    f.result(timeout=30)
                    errors.append("malformed clip did not fail")
                except ValueError:
                    pass  # its own failure only
                return
            f = srv.submit(clip)
            if roll < 0.15:  # cancel while (maybe) queued
                f.cancel()
                return
            out = f.result(timeout=30)  # Timeout/anything else -> errors
            if np.allclose(out, clip * 2.0 + 1.0):
                completed[tid] += 1
            else:
                errors.append("wrong result")

        def client(tid):
            rng = np.random.RandomState(tid)
            while time.monotonic() < stop:
                try:
                    client_body(tid, rng)
                except Exception as e:  # noqa: BLE001
                    errors.append(f"client {tid}: {e!r}")
                    return

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert srv._worker.is_alive(), "collector died during the soak"
        assert not errors, errors[:5]
        assert srv.stats.batches > 0
        assert all(c > 0 for c in completed), completed  # nobody starved
