"""Host-side streaming session: raw-frame buffering around the jitted
chunk forward (models/streaming.py).

The reference's streaming plugins expected the host to feed aligned
chunks with subsampling overlap; this session does that bookkeeping:
push arbitrary-sized feature pieces, it emits logits whenever a full
chunk window (4*chunk + 3 raw frames, stride 4*chunk) is available, and
`finish()` flushes the tail with zero padding.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from m3asr_tpu.config import EncoderConfig, MoEEncoderConfig
from m3asr_tpu.models import streaming


def sparse_topk(logits: jax.Array, k: int):
    """On-device sparse chunk output: per-frame log-softmax top-K
    (sorted best-first), the streaming twin of the engine's
    decode_output="topk" (runtime/engine.py). Shrinks the chunk D2H
    from (B, C, V) floats to (B, C, K) values + int32 ids — at V=5000,
    K=10 that is ~250x less per tick; greedy partials read column 0,
    beam partials feed PrefixBeamState.advance_sparse."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(lp, min(k, logits.shape[-1]))
    return vals, idx.astype(jnp.int32)


def chunk_np(out):
    """Device chunk output -> numpy: array, or (vals, idx) tuple."""
    if isinstance(out, tuple):
        return tuple(np.asarray(o) for o in out)
    return np.asarray(out)


def chunk_slice(out, start: int, end: int):
    """Slice the time axis of a dense or sparse chunk output."""
    if isinstance(out, tuple):
        return tuple(o[:, start:end] for o in out)
    return out[:, start:end]


def chunk_frames(out) -> int:
    """Time-axis length of a dense or sparse chunk output."""
    return (out[0] if isinstance(out, tuple) else out).shape[1]


class StreamingSession:
    def __init__(self, params, cfg: EncoderConfig, chunk_size: int = 16,
                 num_left_chunks: int = 2, batch: int = 1,
                 moe: bool = False, moe_impl: str = "dense",
                 topk: int = 0):
        self.params = params
        self.cfg = cfg
        self.chunk = chunk_size
        self.window = 4 * chunk_size + 3
        self.stride = 4 * chunk_size
        self.moe = moe
        self.topk = topk
        self._batch = batch
        self._cache_T = chunk_size * num_left_chunks
        cache_T = self._cache_T
        self.state = streaming.init_state(cfg, batch, cache_T)
        out_t = (lambda o: sparse_topk(o, topk)) if topk else (lambda o: o)
        if moe:
            assert isinstance(cfg, MoEEncoderConfig)
            self.embed_state = streaming.init_state(cfg.embed_conf, batch,
                                                    cache_T)

            def fn(p, w, s, es):
                out, ns, nes = streaming.forward_chunk_moe(
                    p, cfg, w, s, es, moe_impl=moe_impl)
                return out_t(out), ns, nes
        else:
            def fn(p, w, s):
                out, ns = streaming.forward_chunk(p, cfg, w, s)
                return out_t(out), ns
        self._fn = jax.jit(fn)
        self._buf: Optional[np.ndarray] = None
        self._consumed = 0

    def push(self, feat: np.ndarray) -> List[np.ndarray]:
        """feat: (B, t, input_dim) new frames. Returns list of logits
        chunks (B, chunk, V) that became ready."""
        feat = np.asarray(feat, np.float32)
        self._buf = feat if self._buf is None else np.concatenate(
            [self._buf, feat], axis=1)
        outs = []
        while self._buf.shape[1] - self._consumed >= self.window:
            w = self._buf[:, self._consumed: self._consumed + self.window]
            outs.append(self._step(w))
            self._consumed += self.stride
        if self._consumed > 0:  # bound memory on long-lived streams
            self._buf = self._buf[:, self._consumed:]
            self._consumed = 0
        return outs

    def _step(self, w: np.ndarray) -> np.ndarray:
        if self.moe:
            out, self.state, self.embed_state = self._fn(
                self.params, jnp.asarray(w), self.state, self.embed_state)
        else:
            out, self.state = self._fn(self.params, jnp.asarray(w),
                                       self.state)
        return chunk_np(out)

    def reset(self) -> None:
        """Back to a fresh stream, keeping the jitted chunk function
        (so pooled sessions never recompile — serve.py reuses released
        sessions across connections)."""
        self.state = streaming.init_state(self.cfg, self._batch,
                                          self._cache_T)
        if self.moe:
            self.embed_state = streaming.init_state(
                self.cfg.embed_conf, self._batch, self._cache_T)
        self._buf = None
        self._consumed = 0

    def clone(self) -> "StreamingSession":
        """A fresh-stream session SHARING this one's params and jitted
        chunk function — pool growth costs state init, not a compile."""
        s = object.__new__(type(self))
        s.__dict__.update(self.__dict__)
        s.reset()
        return s

    def finish(self) -> List[np.ndarray]:
        """Flush remaining frames (zero-padded to a full window); emits
        only the output frames covered by real input."""
        if self._buf is None:
            return []
        rest = self._buf.shape[1] - self._consumed
        if rest <= 6:  # fewer raw frames than one output frame needs
            return []
        n_out = (rest - 3) // 4 if rest >= 7 else 0
        if n_out <= 0:
            return []
        w = np.zeros((self._buf.shape[0], self.window,
                      self._buf.shape[2]), np.float32)
        w[:, :rest] = self._buf[:, self._consumed:]
        out = self._step(w)
        return [chunk_slice(out, 0, n_out)]


class DfsmnStreamingSession:
    """Streaming session for the DFSMN family (models/dfsmn_streaming):
    no subsampling, so chunks are frame-aligned (stride == chunk); the
    only host bookkeeping is the FIR look-ahead latency — output frame
    j of the stream corresponds to input frame j - delay, so the first
    `delay` emitted frames are warm-up and dropped. `finish()` pushes
    `delay` zero frames to flush the matured tail."""

    def __init__(self, params, cfg, chunk_size: int = 16, batch: int = 1,
                 cache_T: int = 256, topk: int = 0):
        from m3asr_tpu.models import dfsmn_streaming as S
        self.params = params
        self.cfg = cfg
        self.chunk = chunk_size
        self.topk = topk
        self._batch = batch
        self._cache_T = cache_T
        self.delay = S.stream_delay(cfg)
        self.state = S.init_state(cfg, batch, cache_T)
        out_t = (lambda o: sparse_topk(o, topk)) if topk else (lambda o: o)

        def fn(p, c, s):
            out, ns = S.forward_chunk(p, cfg, c, s)
            return out_t(out), ns
        self._fn = jax.jit(fn)
        self._buf: Optional[np.ndarray] = None
        self._consumed = 0         # buffer-relative frames consumed
        self._fed = 0              # total frames fed to the model
        self._next_pos = 0         # next matured input position to emit

    def _run(self, c: np.ndarray, real_limit: Optional[int]
             ) -> Optional[np.ndarray]:
        out, self.state = self._fn(self.params, jnp.asarray(c), self.state)
        self._fed += c.shape[1]
        out = chunk_np(out)
        C = chunk_frames(out)
        first_pos = self._fed - C - self.delay       # position of out[0]
        start = max(0, self._next_pos - first_pos)
        end = C if real_limit is None else min(C, real_limit - first_pos)
        if end <= start:
            return None
        self._next_pos = first_pos + end
        return chunk_slice(out, start, end)

    def push(self, feat: np.ndarray) -> List[np.ndarray]:
        """feat: (B, t, input_dim). Returns matured logits pieces."""
        feat = np.asarray(feat, np.float32)
        self._buf = feat if self._buf is None else np.concatenate(
            [self._buf, feat], axis=1)
        outs = []
        while self._buf.shape[1] - self._consumed >= self.chunk:
            c = self._buf[:, self._consumed: self._consumed + self.chunk]
            self._consumed += self.chunk
            o = self._run(c, None)
            if o is not None:
                outs.append(o)
        if self._consumed > 0:  # bound memory on long-lived streams
            self._buf = self._buf[:, self._consumed:]
            self._consumed = 0
        return outs

    def reset(self) -> None:
        """Fresh stream, same jitted chunk function (pool reuse)."""
        from m3asr_tpu.models import dfsmn_streaming as S
        self.state = S.init_state(self.cfg, self._batch, self._cache_T)
        self._buf = None
        self._consumed = 0
        self._fed = 0
        self._next_pos = 0

    def clone(self) -> "DfsmnStreamingSession":
        """Fresh-stream session sharing params + jitted chunk fn."""
        s = object.__new__(type(self))
        s.__dict__.update(self.__dict__)
        s.reset()
        return s

    def finish(self) -> List[np.ndarray]:
        """Zero-pad the tail + delay so every real frame matures; emits
        only frames covered by real input."""
        if self._buf is None:
            return []
        rest = self._buf.shape[1] - self._consumed
        total = self._fed + rest           # global stream length
        need = rest + self.delay
        pad = (-need) % self.chunk
        tail = np.zeros((self._buf.shape[0], need + pad,
                         self._buf.shape[2]), np.float32)
        if rest:
            tail[:, :rest] = self._buf[:, self._consumed:]
        outs = []
        off = 0
        while off < tail.shape[1]:
            o = self._run(tail[:, off:off + self.chunk], total)
            off += self.chunk
            if o is not None:
                outs.append(o)
        return outs


class DfsmnMoeStreamingSession(DfsmnStreamingSession):
    """Streaming session for the MoE-DFSMN family
    (dfsmn_streaming.forward_chunk_moe): the embed substream, its
    router-alignment ring and the main-path input delay all live in the
    chunk program's state; this driver only adds the total delay
    (input buffer + FIR look-aheads) to the plain session's maturity
    bookkeeping. State is created lazily on the first chunk (the input
    feature dim sizes the delay buffer)."""

    def __init__(self, params, cfg, chunk_size: int = 16, batch: int = 1,
                 cache_T: int = 256, moe_impl: str = "dense",
                 topk: int = 0):
        from m3asr_tpu.models import dfsmn_streaming as S
        self.params = params
        self.cfg = cfg
        self.chunk = chunk_size
        self.topk = topk
        self._batch = batch
        self._cache_T = cache_T
        self.delay = S.moe_stream_delay(cfg, chunk_size)
        self.state = None
        out_t = (lambda o: sparse_topk(o, topk)) if topk else (lambda o: o)

        def fn(p, c, s):
            out, ns = S.forward_chunk_moe(p, cfg, c, s, moe_impl=moe_impl)
            return out_t(out), ns
        self._fn = jax.jit(fn)
        self._buf: Optional[np.ndarray] = None
        self._consumed = 0
        self._fed = 0
        self._next_pos = 0

    def _run(self, c: np.ndarray, real_limit: Optional[int]
             ) -> Optional[np.ndarray]:
        if self.state is None:
            from m3asr_tpu.models import dfsmn_streaming as S
            self.state = S.init_moe_state(self.cfg, self._batch,
                                          self._cache_T, self.chunk,
                                          c.shape[-1])
        return super()._run(c, real_limit)

    def reset(self) -> None:
        self.state = None
        self._buf = None
        self._consumed = 0
        self._fed = 0
        self._next_pos = 0
