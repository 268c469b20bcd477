"""MicroBatcher: co-arriving requests ride one engine call, results
route back to the right caller, errors propagate."""

import threading
import time

import numpy as np

from m3asr_tpu.runtime.batching import MicroBatcher


def fake_infer(feats, lens):
    # identity "engine": out_len = len, out = the padded input
    return feats.copy(), lens.copy()


def _run_concurrent(batcher, feats):
    results = [None] * len(feats)
    barrier = threading.Barrier(len(feats))

    def worker(i):
        barrier.wait()
        results[i] = batcher.infer(feats[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(feats))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


def test_concurrent_requests_are_batched_and_routed():
    batcher = MicroBatcher(fake_infer, window_ms=100.0, max_batch=8)
    try:
        feats = [np.full((5 + i, 3), i, np.float32) for i in range(6)]
        results = _run_concurrent(batcher, feats)
        for i, (out, out_len) in enumerate(results):
            assert out_len == 5 + i
            np.testing.assert_array_equal(out, feats[i])
        sizes = batcher.batch_sizes
        assert sum(sizes) == 6
        assert max(sizes) > 1          # the window actually coalesced
    finally:
        batcher.close()


def test_max_batch_dispatches_before_window():
    batcher = MicroBatcher(fake_infer, window_ms=60_000.0, max_batch=2)
    try:
        t0 = time.monotonic()
        feats = [np.ones((4, 2), np.float32) for _ in range(4)]
        results = _run_concurrent(batcher, feats)
        assert time.monotonic() - t0 < 30  # did not wait out the window
        assert all(r[1] == 4 for r in results)
        assert all(s <= 2 for s in batcher.batch_sizes)
        assert sum(batcher.batch_sizes) == 4
    finally:
        batcher.close()


def test_infer_errors_propagate_to_callers():
    def boom(feats, lens):
        raise ValueError("engine exploded")

    batcher = MicroBatcher(boom, window_ms=1.0, max_batch=4)
    try:
        err = None
        try:
            batcher.infer(np.ones((3, 2), np.float32))
        except ValueError as e:
            err = e
        assert err is not None and "exploded" in str(err)
    finally:
        batcher.close()


def test_closed_batcher_rejects():
    batcher = MicroBatcher(fake_infer, window_ms=1.0, max_batch=4)
    batcher.close()
    try:
        batcher.infer(np.ones((3, 2), np.float32))
        assert False, "should raise"
    except RuntimeError:
        pass
