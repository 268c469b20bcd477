"""Cross-stream chunk micro-batching (VERDICT r1 weak #6): N streams
on one batched chunk program produce exactly the per-stream outputs of
independent single-stream sessions, idle slots never advance, and
co-pending chunks actually coalesce into one call."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import threading

import numpy as np

import jax
import jax.numpy as jnp

from m3asr_tpu.config import EncoderConfig, MoEConfig, MoEEncoderConfig
from m3asr_tpu.models import conformer, streaming
from m3asr_tpu.runtime.streaming_batch import (BatchedStreamingSession,
                                               SlotsFull, StreamBatcher)
from m3asr_tpu.runtime.streaming_session import StreamingSession

from test_op_parity import allclose

CHUNK = 4
LEFT = 2
CACHE_T = CHUNK * LEFT


def dense_setup(seed=3):
    cfg = EncoderConfig(attention_dim=32, attention_heads=4,
                        linear_units=48, num_blocks=2, causal=True,
                        cnn_module_norm="layer_norm")
    params = conformer.init(jax.random.PRNGKey(seed), cfg, 20, 11)
    return cfg, params


def moe_setup(seed=5):
    cfg = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=2, causal=True,
        cnn_module_norm="layer_norm",
        embed_conf=EncoderConfig(attention_dim=24, attention_heads=4,
                                 linear_units=32, num_blocks=1,
                                 causal=True,
                                 cnn_module_norm="layer_norm"),
        moe_conf=MoEConfig(num_experts=4, hidden_units=48))
    from m3asr_tpu.models import moe_conformer
    params = moe_conformer.init(jax.random.PRNGKey(seed), cfg, 20, 11)
    return cfg, params


def test_per_slot_offsets_match_scalar_offset_runs():
    """The batched per-slot state: slot ages differ, outputs equal the
    scalar-offset single-stream programs chunk for chunk."""
    cfg, params = dense_setup()
    rng = np.random.RandomState(7)
    W = 4 * CHUNK + 3
    # stream A runs 3 chunks, stream B runs 2 (B starts one tick later)
    wins_a = [rng.randn(1, W, 20).astype(np.float32) for _ in range(3)]
    wins_b = [rng.randn(1, W, 20).astype(np.float32) for _ in range(2)]

    def ref_stream(wins):
        st = streaming.init_state(cfg, 1, CACHE_T)
        outs = []
        for w in wins:
            o, st = streaming.forward_chunk(params, cfg, jnp.asarray(w),
                                            st)
            outs.append(np.asarray(o))
        return outs

    ref_a, ref_b = ref_stream(wins_a), ref_stream(wins_b)

    # batched: slots (A, B); tick 0 = A alone, ticks 1-2 = both
    state = streaming.init_state(cfg, 2, CACHE_T, per_slot=True)

    def _step(w, m, s):
        out, ns = streaming.forward_chunk(params, cfg, w, s)
        return out, streaming.select_state(m, ns, s)

    step = jax.jit(_step)

    def tick(wa, wb):
        nonlocal state
        mask = np.array([wa is not None, wb is not None])
        windows = np.zeros((2, W, 20), np.float32)
        if wa is not None:
            windows[0] = wa[0]
        if wb is not None:
            windows[1] = wb[0]
        out, state = step(jnp.asarray(windows), jnp.asarray(mask), state)
        return np.asarray(out)

    o0 = tick(wins_a[0], None)
    o1 = tick(wins_a[1], wins_b[0])
    o2 = tick(wins_a[2], wins_b[1])
    allclose(o0[0:1], ref_a[0], rtol=1e-4, atol=1e-4)
    allclose(o1[0:1], ref_a[1], rtol=1e-4, atol=1e-4)
    allclose(o2[0:1], ref_a[2], rtol=1e-4, atol=1e-4)
    allclose(o1[1:2], ref_b[0], rtol=1e-4, atol=1e-4)
    allclose(o2[1:2], ref_b[1], rtol=1e-4, atol=1e-4)


def _feed(session, feat, step_sizes, outs):
    """Push feat into the session in pieces; collect emitted chunks."""
    i = 0
    for n in step_sizes:
        got = session.push(feat[:, i:i + n])
        outs.extend(np.asarray(o) for o in got)
        i += n
    outs.extend(np.asarray(o) for o in session.finish())


def test_batcher_parity_with_independent_sessions():
    """3 concurrent BatchedStreamingSessions == 3 independent
    StreamingSessions on the same inputs (different lengths and
    piece sizes), and at least one tick actually batched >1 stream."""
    cfg, params = dense_setup()
    rng = np.random.RandomState(8)
    feats = [rng.randn(1, T, 20).astype(np.float32)
             for T in (4 * CHUNK * 3 + 3, 4 * CHUNK * 2 + 9, 4 * CHUNK * 4)]
    pieces = [[30, 21, 16], [17, 40], [29, 35]]

    refs = []
    for f, ps in zip(feats, pieces):
        outs = []
        _feed(StreamingSession(params, cfg, chunk_size=CHUNK,
                               num_left_chunks=LEFT), f, ps, outs)
        refs.append(outs)

    batcher = StreamBatcher(params, cfg, chunk_size=CHUNK,
                            num_left_chunks=LEFT, slots=4, window_ms=20.0)
    try:
        sessions = [BatchedStreamingSession(batcher) for _ in range(3)]
        got = [[] for _ in range(3)]
        threads = [threading.Thread(target=_feed,
                                    args=(sessions[i], feats[i],
                                          pieces[i], got[i]))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(3):
            assert len(got[i]) == len(refs[i]), (i, len(got[i]),
                                                 len(refs[i]))
            for a, b in zip(got[i], refs[i]):
                allclose(a, b, rtol=1e-4, atol=1e-4)
        assert max(batcher.batch_sizes) > 1, batcher.batch_sizes
    finally:
        batcher.close()


def _np_topk(arr, k):
    """Reference top-K of dense logits chunks: per-frame log-softmax,
    sorted best-first (unique order for distinct random floats)."""
    m = arr.max(-1, keepdims=True)
    lp = arr - m - np.log(np.exp(arr - m).sum(-1, keepdims=True))
    idx = np.argsort(-lp, axis=-1)[..., :k]
    vals = np.take_along_axis(lp, idx, axis=-1)
    return vals.astype(np.float32), idx.astype(np.int32)


def _feed_any(session, feat, step_sizes, outs):
    """_feed without the np.asarray coercion (sparse chunks are
    (vals, idx) tuples)."""
    i = 0
    for n in step_sizes:
        outs.extend(session.push(feat[:, i:i + n]))
        i += n
    outs.extend(session.finish())


def test_sparse_session_matches_dense_topk():
    """StreamingSession(topk=K) emits exactly the per-frame top-K
    log-softmax of the dense session's logits chunks (values and ids),
    including the zero-padded finish() tail."""
    cfg, params = dense_setup()
    rng = np.random.RandomState(11)
    feat = rng.randn(1, 4 * CHUNK * 3 + 9, 20).astype(np.float32)
    pieces = [25, 40, feat.shape[1] - 65]
    K = 5

    dense_outs, sparse_outs = [], []
    _feed_any(StreamingSession(params, cfg, chunk_size=CHUNK,
                               num_left_chunks=LEFT), feat, pieces,
              dense_outs)
    _feed_any(StreamingSession(params, cfg, chunk_size=CHUNK,
                               num_left_chunks=LEFT, topk=K), feat,
              pieces, sparse_outs)
    assert len(dense_outs) == len(sparse_outs) > 0
    for d, (vals, idx) in zip(dense_outs, sparse_outs):
        assert vals.shape == idx.shape == d.shape[:2] + (K,)
        ref_v, ref_i = _np_topk(np.asarray(d), K)
        np.testing.assert_array_equal(np.asarray(idx), ref_i)
        allclose(np.asarray(vals), ref_v, rtol=1e-4, atol=1e-4)


def test_sparse_batcher_parity():
    """Concurrent sparse BatchedStreamingSessions == top-K of the
    independent dense sessions (exercises the tuple path through
    _dispatch slicing and per-slot result fan-out)."""
    cfg, params = dense_setup()
    rng = np.random.RandomState(12)
    feats = [rng.randn(1, T, 20).astype(np.float32)
             for T in (4 * CHUNK * 3 + 3, 4 * CHUNK * 2 + 9)]
    pieces = [[30, 21, 16], [17, 40]]
    K = 4

    refs = []
    for f, ps in zip(feats, pieces):
        outs = []
        _feed_any(StreamingSession(params, cfg, chunk_size=CHUNK,
                                   num_left_chunks=LEFT), f, ps, outs)
        refs.append(outs)

    batcher = StreamBatcher(params, cfg, chunk_size=CHUNK,
                            num_left_chunks=LEFT, slots=4,
                            window_ms=20.0, topk=K)
    try:
        sessions = [BatchedStreamingSession(batcher) for _ in range(2)]
        got = [[] for _ in range(2)]
        threads = [threading.Thread(target=_feed_any,
                                    args=(sessions[i], feats[i],
                                          pieces[i], got[i]))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(2):
            assert len(got[i]) == len(refs[i])
            for (vals, idx), d in zip(got[i], refs[i]):
                ref_v, ref_i = _np_topk(np.asarray(d), K)
                np.testing.assert_array_equal(np.asarray(idx), ref_i)
                allclose(np.asarray(vals), ref_v, rtol=1e-4, atol=1e-4)
    finally:
        batcher.close()


def test_sparse_dfsmn_session_matches_dense_topk():
    """DFSMN sparse streaming: the tuple chunk output rides the
    maturity slicing (_run start/end) exactly like the dense array."""
    from m3asr_tpu.models import dfsmn
    from m3asr_tpu.runtime.streaming_session import DfsmnStreamingSession

    cfg = dfsmn.DfsmnSanConfig(num_block=2, fsmn_each_block=3,
                               hidden_dim=32, memory_dim=16, look_back=4,
                               look_ahead=0, stride_left=2,
                               stride_right=1, num_head=4, num_memory=8)
    params = dfsmn.init_dfsmn_san(jax.random.PRNGKey(2), cfg, 16, 9)
    rng = np.random.RandomState(13)
    feat = rng.randn(1, 50, 16).astype(np.float32)
    pieces = [19, 22, 9]
    K = 3

    dense_outs, sparse_outs = [], []
    _feed_any(DfsmnStreamingSession(params, cfg, chunk_size=8), feat,
              pieces, dense_outs)
    _feed_any(DfsmnStreamingSession(params, cfg, chunk_size=8, topk=K),
              feat, pieces, sparse_outs)
    assert len(dense_outs) == len(sparse_outs) > 0
    for d, (vals, idx) in zip(dense_outs, sparse_outs):
        ref_v, ref_i = _np_topk(np.asarray(d), K)
        np.testing.assert_array_equal(np.asarray(idx), ref_i)
        allclose(np.asarray(vals), ref_v, rtol=1e-4, atol=1e-4)


def test_idle_slots_do_not_advance():
    """Opening a second slot and letting it idle while the first runs
    must leave the idle stream exactly fresh."""
    cfg, params = dense_setup()
    rng = np.random.RandomState(9)
    W = 4 * CHUNK + 3
    feat = rng.randn(1, 4 * CHUNK * 2 + 3, 20).astype(np.float32)

    batcher = StreamBatcher(params, cfg, chunk_size=CHUNK,
                            num_left_chunks=LEFT, slots=2, window_ms=0.0)
    try:
        s_active = BatchedStreamingSession(batcher)
        s_idle = BatchedStreamingSession(batcher)
        outs = []
        _feed(s_active, feat, [feat.shape[1]], outs)
        # now drive the idle slot: must equal a fresh single stream
        w = rng.randn(1, W, 20).astype(np.float32)
        got = s_idle._step(w)
        ref = np.asarray(streaming.forward_chunk(
            params, cfg, jnp.asarray(w),
            streaming.init_state(cfg, 1, CACHE_T))[0])
        allclose(got, ref, rtol=1e-4, atol=1e-4)
    finally:
        batcher.close()


def test_slots_full_falls_back_to_dedicated_session():
    """With 1 slot and 2 live streams, the overflow stream serves
    through a dedicated fallback session with correct outputs, and a
    reset() frees the slot for the next stream."""
    cfg, params = dense_setup()
    rng = np.random.RandomState(12)
    W = 4 * CHUNK + 3
    batcher = StreamBatcher(params, cfg, chunk_size=CHUNK,
                            num_left_chunks=LEFT, slots=1, window_ms=0.0)
    try:
        first = BatchedStreamingSession(batcher)
        second = first.clone()
        w1 = rng.randn(1, W, 20).astype(np.float32)
        w2 = rng.randn(1, W, 20).astype(np.float32)
        first._step(w1)                       # occupies the only slot
        got = second._step(w2)                # overload -> fallback
        assert second._fallback is not None
        ref = np.asarray(streaming.forward_chunk(
            params, cfg, jnp.asarray(w2),
            streaming.init_state(cfg, 1, CACHE_T))[0])
        allclose(got, ref, rtol=1e-4, atol=1e-4)
        # releasing the first stream frees the slot for a new stream
        first.reset()
        third = first.clone()
        third._step(w2)
        assert third.slot is not None and third._fallback is None
    finally:
        batcher.close()


def test_push_validation_rejects_bad_windows():
    """A malformed window fails its own push only — co-batched streams
    and the shared state stay healthy."""
    import pytest
    cfg, params = dense_setup()
    W = 4 * CHUNK + 3
    batcher = StreamBatcher(params, cfg, chunk_size=CHUNK,
                            num_left_chunks=LEFT, slots=2, window_ms=0.0)
    try:
        s = BatchedStreamingSession(batcher)
        rng = np.random.RandomState(13)
        good = rng.randn(1, W, 20).astype(np.float32)
        s._step(good)
        with pytest.raises(ValueError):
            batcher.push(s.slot, rng.randn(1, W - 1, 20))   # wrong W
        with pytest.raises(ValueError):
            batcher.push(s.slot, rng.randn(1, W, 19))       # wrong D
        # the stream still works after the rejected pushes
        out = s._step(good)
        assert np.isfinite(out).all()
    finally:
        batcher.close()


def test_dfsmn_batcher_parity():
    """DFSMN streams (incl. FIR look-ahead delay bookkeeping) batch
    across slots with per-slot offsets: outputs equal independent
    DfsmnStreamingSessions."""
    from m3asr_tpu.models import dfsmn
    from m3asr_tpu.runtime.streaming_batch import (
        BatchedDfsmnStreamingSession, DfsmnStreamBatcher)
    from m3asr_tpu.runtime.streaming_session import DfsmnStreamingSession

    cfg = dfsmn.DfsmnSanConfig(num_block=2, fsmn_each_block=2,
                               hidden_dim=24, memory_dim=16, num_head=4,
                               num_memory=8, look_ahead=1)
    params = dfsmn.init_dfsmn_san(jax.random.PRNGKey(20), cfg, 16, 9)
    rng = np.random.RandomState(21)
    feats = [rng.randn(1, T, 16).astype(np.float32) for T in (26, 19)]
    pieces = [[7, 13, 6], [10, 9]]

    refs = []
    for f, ps in zip(feats, pieces):
        outs = []
        _feed(DfsmnStreamingSession(params, cfg, chunk_size=6,
                                    cache_T=32), f, ps, outs)
        refs.append(outs)

    batcher = DfsmnStreamBatcher(params, cfg, chunk_size=6, slots=3,
                                 cache_T=32, window_ms=20.0)
    try:
        sessions = [BatchedDfsmnStreamingSession(batcher)
                    for _ in range(2)]
        got = [[] for _ in range(2)]
        threads = [threading.Thread(target=_feed,
                                    args=(sessions[i], feats[i],
                                          pieces[i], got[i]))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(2):
            assert len(got[i]) == len(refs[i]), (i, len(got[i]),
                                                 len(refs[i]))
            for a, b in zip(got[i], refs[i]):
                allclose(a, b, rtol=1e-4, atol=1e-4)
        assert max(batcher.batch_sizes) > 1, batcher.batch_sizes
    finally:
        batcher.close()


def test_dfsmn_moe_batcher_parity():
    """MoE-DFSMN batched streams (embed substream + router-alignment
    ring + input delay buffer all per-slot) == independent sessions."""
    from m3asr_tpu.models import dfsmn
    from m3asr_tpu.runtime.streaming_batch import (
        BatchedDfsmnStreamingSession, DfsmnStreamBatcher)
    from m3asr_tpu.runtime.streaming_session import (
        DfsmnMoeStreamingSession)

    cfg = dfsmn.DfsmnSanMoEConfig(
        num_block=2, fsmn_each_block=2, hidden_dim=24, memory_dim=16,
        num_head=4, num_memory=8, num_experts=2, embed_dim=16,
        look_ahead=1,
        embed_conf=dfsmn.DfsmnSanConfig(
            num_block=1, fsmn_each_block=2, hidden_dim=24,
            memory_dim=16, num_head=4, num_memory=8, look_ahead=1))
    params = dfsmn.init_dfsmn_san_moe(jax.random.PRNGKey(22), cfg, 12, 7,
                                      rand_init_router=True)
    rng = np.random.RandomState(23)
    feats = [rng.randn(1, T, 12).astype(np.float32) for T in (24, 18)]

    refs = []
    for f in feats:
        outs = []
        _feed(DfsmnMoeStreamingSession(params, cfg, chunk_size=6,
                                       cache_T=32), f, [f.shape[1]],
              outs)
        refs.append(outs)

    batcher = DfsmnStreamBatcher(params, cfg, chunk_size=6, slots=2,
                                 cache_T=32, moe=True, window_ms=20.0)
    try:
        sessions = [BatchedDfsmnStreamingSession(batcher)
                    for _ in range(2)]
        got = [[] for _ in range(2)]
        threads = [threading.Thread(target=_feed,
                                    args=(sessions[i], feats[i],
                                          [feats[i].shape[1]], got[i]))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(2):
            assert len(got[i]) == len(refs[i])
            for a, b in zip(got[i], refs[i]):
                allclose(a, b, rtol=1e-4, atol=1e-4)
    finally:
        batcher.close()


def test_moe_batcher_parity():
    """The hier MoE chunk program batches across streams too (embed
    substream state included)."""
    cfg, params = moe_setup()
    rng = np.random.RandomState(10)
    feats = [rng.randn(1, 4 * CHUNK * 2 + 3, 20).astype(np.float32)
             for _ in range(2)]

    refs = []
    for f in feats:
        outs = []
        _feed(StreamingSession(params, cfg, chunk_size=CHUNK,
                               num_left_chunks=LEFT, moe=True), f,
              [f.shape[1]], outs)
        refs.append(outs)

    batcher = StreamBatcher(params, cfg, chunk_size=CHUNK,
                            num_left_chunks=LEFT, slots=2, moe=True,
                            window_ms=20.0)
    try:
        sessions = [BatchedStreamingSession(batcher) for _ in range(2)]
        got = [[] for _ in range(2)]
        threads = [threading.Thread(target=_feed,
                                    args=(sessions[i], feats[i],
                                          [feats[i].shape[1]], got[i]))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(2):
            assert len(got[i]) == len(refs[i])
            for a, b in zip(got[i], refs[i]):
                allclose(a, b, rtol=1e-4, atol=1e-4)
    finally:
        batcher.close()
