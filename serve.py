#!/usr/bin/env python3
"""Minimal serving daemon: newline-delimited JSON over TCP.

Production-deployment entry point the reference leaves to the user
(its infer.py is one-shot). One engine; concurrent requests arriving
within --batch-window-ms are padded into ONE batched engine call
(runtime/batching.MicroBatcher — the MoE forward is HBM-bound, so a
batch of B costs ~one utterance of wall time); CTC decode on host
(native C++ when available).

Protocol (one JSON object per line):
  request:  {"id": "utt1", "feat": [[...frame...], ...],
             "decode": "greedy"|"beam", "beam_size": 10,
             "timestamps": true,                  # optional
             "confidence": true,                  # optional
             "nbest": 5,                          # optional (beam)
             "context": [[ids...], ...],          # optional hotword
             "context_bonus": 3.0}                #   biasing (beam)
  response: {"id": "utt1", "hyp": [ids...], "out_len": N,
             "latency_ms": x, "times": [frames...],   # if requested
             "nbest": [{"hyp": [...], "score": s}, ...]}  # if requested

Streaming (one stream per connection; chunk-incremental greedy CTC
partials via StreamingSession / DfsmnStreamingSession — sessions are
pooled and their jitted chunk forwards reused across connections):
  {"stream": "start", "chunk_size": 16, "num_left_chunks": 2,
   "decode": "beam", "beam_size": 10,        # optional: incremental
   "context": [[ids...]], "timestamps": true}  # prefix beam (+hotwords
      -> {"ok": true, "chunk_size": 16}         # +server LM fusion)
  {"stream": "chunk", "feat": [[...frame...], ...]}
      -> {"partial": [ids...], "out_frames": N}
         (+"endpoint": true once >= endpoint_blank_frames trailing
          blank frames follow speech — pass the threshold at start)
  {"stream": "end"}
      -> {"hyp": [ids...], "out_frames": N, "final": true}

By default chunk programs emit on-device sparse top-K outputs
(--stream_topk, the streaming twin of engine decode_output="topk"):
per-frame log-softmax top-K values+ids cross device->host instead of
(C, V) logits — ~V/K x less transfer per tick, identical partials
(greedy = column 0; beam = advance_sparse, exact for beam_size <= K).
--stream_topk 0 restores dense logits chunks.
"""

import argparse
import collections
import json
import os
import socketserver
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


class _StreamDecode:
    """Incremental CTC over emitted logits chunks. Default: greedy —
    collapse consecutive repeats, drop blanks (model/encoder.py:156-180
    semantics, frame-local so it streams). With `beam_state`
    (decode.ctc.PrefixBeamState): chunk-incremental prefix beam search,
    including optional hotword biasing and LM fusion — beam partials
    may revise earlier tokens as more audio arrives (the usual
    streaming-beam contract)."""

    def __init__(self, session, blank: int = 0, beam_state=None,
                 endpoint_blank_frames: int = 0):
        self.session = session
        self.blank = blank
        self.beam = beam_state
        self.prev = -1
        self.hyp = []
        self.times = []  # absolute emission frame per token
        self.frames = 0
        # rule-based endpointing (the WeNet-style trailing-silence
        # rule): once speech was seen, >= N consecutive trailing blank
        # frames (post-subsample argmax) flag end-of-speech
        self.ep_blanks = int(endpoint_blank_frames)
        self._trailing_blanks = 0
        self._spoke = False

    def update(self, chunks) -> None:
        for ch in chunks:
            if isinstance(ch, tuple):
                # sparse chunk (serve.py --stream_topk): per-frame
                # top-K log-softmax (vals, idx), best-first — column 0
                # IS the dense argmax; beam partials ride
                # advance_sparse (identical hypotheses for
                # K >= beam_size, decode/ctc.py)
                vals, idx = (np.asarray(ch[0])[0], np.asarray(ch[1])[0])
                top1 = idx[:, 0]
                if self.ep_blanks:
                    for t in top1:
                        if int(t) == self.blank:
                            self._trailing_blanks += 1
                        else:
                            self._trailing_blanks = 0
                            self._spoke = True
                if self.beam is not None:
                    self.beam.advance_sparse(vals, idx)
                    self.frames += vals.shape[0]
                    continue
                for t in top1:
                    t = int(t)
                    if t != self.prev and t != self.blank:
                        self.hyp.append(t)
                        self.times.append(self.frames)
                    self.prev = t
                    self.frames += 1
                continue
            arr = np.asarray(ch)[0]          # (T, V) logits
            if self.ep_blanks:
                for t in arr.argmax(-1):
                    if int(t) == self.blank:
                        self._trailing_blanks += 1
                    else:
                        self._trailing_blanks = 0
                        self._spoke = True
            if self.beam is not None:
                m = arr.max(-1, keepdims=True)
                lp = arr - m - np.log(
                    np.exp(arr - m).sum(-1, keepdims=True))
                self.beam.advance(lp)
                self.frames += arr.shape[0]
                continue
            for t in arr.argmax(-1):
                t = int(t)
                if t != self.prev and t != self.blank:
                    self.hyp.append(t)
                    self.times.append(self.frames)
                self.prev = t
                self.frames += 1

    def endpoint(self) -> bool:
        """End-of-speech per the trailing-blank rule (False when
        endpointing is disabled or no speech has been seen yet)."""
        return bool(self.ep_blanks and self._spoke
                    and self._trailing_blanks >= self.ep_blanks)

    def result(self):
        """(tokens, times) of the current best hypothesis."""
        if self.beam is not None:
            best = self.beam.nbest()[0]
            return list(best.tokens), list(best.times)
        return list(self.hyp), list(self.times)


class SessionPool:
    """Released sessions keep their compiled chunk step; acquire()
    prefers one with the same (chunk_size, left) key. The first
    session per key becomes a template that later misses clone() —
    N concurrent cold streams share ONE compile of the chunk program
    instead of compiling it N times."""

    def __init__(self, factory):
        self._factory = factory
        self._free = {}
        self._templates = {}
        self._lock = threading.Lock()

    def acquire(self, key):
        with self._lock:
            lst = self._free.get(key)
            if lst:
                return lst.pop()
            template = self._templates.get(key)
        if template is None:
            template = self._factory(*key)
            with self._lock:
                template = self._templates.setdefault(key, template)
        return template.clone()

    def release(self, key, session) -> None:
        session.reset()
        with self._lock:
            self._free.setdefault(key, []).append(session)


def make_handler(state, default_beam, lm=None, default_lm_weight=0.5):
    """state: mutable dict {"engine", "batcher", "stream_pool"} — read
    per request so a SIGHUP hot-reload (main._reload) swaps the whole
    runtime atomically; in-flight requests and open streams finish on
    the objects they started with."""
    from m3asr_tpu.decode import native

    class Handler(socketserver.StreamRequestHandler):
        # requests currently being processed (NOT open connections —
        # an idle keep-alive/stream connection must not hold up the
        # shutdown drain), for the bounded drain at shutdown
        active = 0
        last_activity = 0.0
        _active_lock = threading.Lock()
        # rolling request latencies for the stats endpoint
        _lat_ms = collections.deque(maxlen=2048)
        _started = time.time()
        _served = 0

        def _stream_request(self, req):
            stream_pool = state["stream_pool"]
            if stream_pool is None:
                return {"error": "streaming unsupported for this model "
                                 "family"}
            op = req["stream"]
            if op == "start":
                if self._stream is not None:
                    return {"error": "stream already started"}
                key = (int(req.get("chunk_size", 16)),
                       int(req.get("num_left_chunks", 2)))
                self._stream_key = key
                # sessions must release into the pool they came from
                # (a hot reload may swap state["stream_pool"] mid-stream)
                self._stream_pool = stream_pool
                beam_state = None
                if req.get("decode") == "beam":
                    from m3asr_tpu.decode.ctc import ContextTrie
                    ctx = req.get("context")
                    trie = (ContextTrie(
                        ctx, float(req.get("context_bonus", 3.0)))
                        if ctx else None)
                    use_lm = lm if req.get("lm", True) else None
                    # C++ incremental beam when the native lib loads,
                    # python PrefixBeamState otherwise (same contract)
                    beam_state = native.make_beam_state(
                        int(req.get("beam_size", default_beam)),
                        context=trie, lm=use_lm,
                        lm_weight=float(req.get("lm_weight",
                                                default_lm_weight)))
                self._stream = _StreamDecode(
                    stream_pool.acquire(key), beam_state=beam_state,
                    endpoint_blank_frames=int(
                        req.get("endpoint_blank_frames", 0)))
                self._stream_times = bool(req.get("timestamps"))
                return {"ok": True, "chunk_size": key[0]}
            if self._stream is None:
                return {"error": "no active stream (send start first)"}
            if op == "chunk":
                feat = np.asarray(req["feat"], np.float32)[None]
                self._stream.update(self._stream.session.push(feat))
                toks, times = self._stream.result()
                resp = {"partial": toks,
                        "out_frames": self._stream.frames}
                if self._stream.endpoint():
                    resp["endpoint"] = True  # end-of-speech detected —
                    # the client should send {"stream": "end"}
                if self._stream_times:
                    resp["times"] = times
                return resp
            if op == "end":
                self._stream.update(self._stream.session.finish())
                toks, times = self._stream.result()
                resp = {"hyp": toks,
                        "out_frames": self._stream.frames, "final": True}
                if self._stream_times:
                    resp["times"] = times
                self._stream_pool.release(self._stream_key,
                                          self._stream.session)
                self._stream = None
                return resp
            return {"error": f"unknown stream op {op!r}"}

        def finish(self):
            # connection dropped mid-stream: recycle the session
            if getattr(self, "_stream", None) is not None:
                self._stream_pool.release(self._stream_key,
                                          self._stream.session)
                self._stream = None
            super().finish()

        def handle(self):
            self._stream = None
            cls = type(self)
            for line in self.rfile:
                line = line.strip()
                if not line:
                    continue
                with cls._active_lock:
                    cls.active += 1
                    cls.last_activity = time.time()
                try:
                    self._one_request(line)
                finally:
                    with cls._active_lock:
                        cls.active -= 1
                        cls.last_activity = time.time()

        def _one_request(self, line):
                try:
                    req = json.loads(line)
                    if req.get("stats"):
                        # observability: dispatch history + slot usage
                        # + rolling latency percentiles + uptime
                        cls = type(self)
                        lat = sorted(cls._lat_ms)
                        pct = (lambda q: round(
                            lat[min(len(lat) - 1,
                                    int(q * len(lat)))], 2)) \
                            if lat else (lambda q: None)
                        stream_pool = state["stream_pool"]
                        resp = {"request_batch_sizes":
                                state["batcher"].batch_sizes[-50:],
                                "served": cls._served,
                                "uptime_s": round(
                                    time.time() - cls._started, 1),
                                "latency_ms": {"p50": pct(0.50),
                                               "p95": pct(0.95),
                                               "p99": pct(0.99)}}
                        if stream_pool is not None:
                            # DFSMN batcher cores are shared per chunk
                            # size (the factory ignores `left`), so
                            # several pool template keys can point at
                            # ONE core — dedupe by identity so slot
                            # counts aren't double-reported
                            sb = {}
                            by_core = {}
                            for key, b in list(
                                    getattr(stream_pool, "_templates",
                                            {}).items()):
                                core = getattr(b, "batcher", None)
                                if core is None:
                                    continue
                                ent = by_core.get(id(core))
                                if ent is None:
                                    ent = {"pool_keys": [],
                                           "slots_free": len(core._free),
                                           "slots": core.slots,
                                           "tick_batch_sizes":
                                               core.batch_sizes[-50:]}
                                    by_core[id(core)] = ent
                                ent["pool_keys"].append(str(key))
                                # every pool key stays addressable;
                                # shared cores alias ONE entry (its
                                # pool_keys lists the aliases) so slot
                                # counts aren't double-counted
                                sb[str(key)] = ent
                            resp["stream_batchers"] = sb
                        self.wfile.write((json.dumps(resp) + "\n")
                                         .encode())
                        self.wfile.flush()
                        return
                    if "stream" in req:
                        resp = self._stream_request(req)
                        self.wfile.write((json.dumps(resp) + "\n")
                                         .encode())
                        self.wfile.flush()
                        return
                    feat = np.asarray(req["feat"], np.float32)
                    t0 = time.perf_counter()
                    engine = state["engine"]
                    batcher = state["batcher"]
                    # sparse on-device decode outputs (engine built with
                    # --decode_output argmax/topk): out1 is ids / top-K
                    # values and aux1 the best log-probs / top-K ids
                    dmode = (engine.cfg.decode_output
                             if engine is not None else "logits")
                    aux1 = None
                    if (engine is not None
                            and feat.shape[0] > engine.buckets.lengths[-1]):
                        # long-form: beyond the largest bucket, decode
                        # through windowed center-cut stitching (bypasses
                        # the micro-batcher — these are rare, slow calls)
                        r = engine.infer_long(feat)
                        out1, out_len = r[0][0], int(r[1][0])
                        if len(r) > 2:
                            aux1 = np.asarray(r[2])[0]
                    else:
                        r = batcher.infer(feat)
                        out1, out_len = r[0], r[1]
                        if dmode == "beam":
                            # (beam, T') n-best ids + (beam,) lens/scores
                            beam_lens = np.asarray(r[2])
                            beam_scores = np.asarray(r[3])
                        elif len(r) > 2:
                            aux1 = np.asarray(r[2])
                    mode = req.get("decode", "greedy")
                    want_conf = bool(req.get("confidence"))
                    want_times = bool(req.get("timestamps")) or want_conf
                    ctx = req.get("context")  # [[token ids], ...]
                    times = None
                    nbest_n = int(req.get("nbest", 1))
                    nbest_out = None
                    if dmode == "beam":
                        # the prefix beam search ran inside the engine
                        # (decode/device.py): serve its n-best directly
                        # — greedy requests get the best hypothesis
                        if want_times or want_conf:
                            raise ValueError(
                                "on-device beam engines emit token ids "
                                "only; rebuild with --decode_output topk "
                                "for timestamps/confidence")
                        if ctx or (mode == "beam" and lm is not None
                                   and req.get("lm", True)):
                            raise ValueError(
                                "hotword/LM fusion is a host-side search "
                                "feature; rebuild with --decode_output "
                                "topk to combine it with on-device "
                                "candidates")
                        hyp = [int(t) for t in out1[0, :beam_lens[0]]]
                        if mode == "beam" and nbest_n > 1:
                            nbest_out = [
                                {"hyp": [int(t) for t in
                                         out1[j, :beam_lens[j]]],
                                 "score": round(float(beam_scores[j]), 4)}
                                for j in range(min(nbest_n, out1.shape[0]))
                                if np.isfinite(beam_scores[j])]
                    elif mode == "beam":
                        if dmode == "argmax":
                            raise ValueError(
                                "engine decode_output='argmax' supports "
                                "greedy only; rebuild with --decode_output"
                                " topk (or logits) for beam decoding")
                        beam = int(req.get("beam_size", default_beam))
                        # server-loaded LM applies to beam decoding
                        # unless the request opts out ("lm": false)
                        use_lm = lm if req.get("lm", True) else None
                        if dmode == "topk":
                            if beam > out1.shape[-1]:
                                raise ValueError(
                                    f"beam_size {beam} > engine "
                                    f"decode_topk {out1.shape[-1]}")
                            from m3asr_tpu.decode.ctc import ContextTrie
                            trie = (ContextTrie(
                                ctx, float(req.get("context_bonus", 3.0)))
                                if ctx else None)
                            hyps_nb = \
                                native.ctc_prefix_beam_search_sparse_ext(
                                    out1, aux1, out_len, beam,
                                    context=trie, lm=use_lm,
                                    lm_weight=float(req.get(
                                        "lm_weight", default_lm_weight)))
                        elif want_times or ctx or nbest_n > 1 or use_lm:
                            m = out1.max(-1, keepdims=True)
                            lp = out1 - m - np.log(
                                np.exp(out1 - m).sum(-1, keepdims=True))
                            from m3asr_tpu.decode.ctc import ContextTrie
                            trie = (ContextTrie(
                                ctx, float(req.get("context_bonus", 3.0)))
                                if ctx else None)
                            hyps_nb = native.ctc_prefix_beam_search_ext(
                                lp, out_len, beam, context=trie,
                                lm=use_lm,
                                lm_weight=float(req.get(
                                    "lm_weight", default_lm_weight)))
                        else:
                            m = out1.max(-1, keepdims=True)
                            lp = out1 - m - np.log(
                                np.exp(out1 - m).sum(-1, keepdims=True))
                            hyps_nb = None
                            hyp = list(native.ctc_prefix_beam_search(
                                lp, out_len, beam)[0][0])
                        if hyps_nb is not None:
                            best = hyps_nb[0]
                            hyp = list(best.tokens)
                            times = list(best.times)
                            if nbest_n > 1:
                                nbest_out = [
                                    {"hyp": [int(x) for x in h.tokens],
                                     "score": round(float(h.score), 4),
                                     **({"times": [int(x) for x in h.times]}
                                        if want_times else {})}
                                    for h in hyps_nb[:nbest_n]]
                    else:
                        if dmode in ("argmax", "topk"):
                            ids = (out1 if dmode == "argmax"
                                   else aux1[..., 0])
                            blp = (aux1 if dmode == "argmax"
                                   else out1[..., 0])
                            from m3asr_tpu.decode.ctc import (
                                ctc_greedy_from_ids,
                                ctc_greedy_times_from_ids)
                            if want_times:
                                best = ctc_greedy_times_from_ids(
                                    ids[None], blp[None],
                                    np.array([out_len]))[0]
                                hyp = list(best.tokens)
                                times = list(best.times)
                            else:
                                hyp = ctc_greedy_from_ids(
                                    ids[None], np.array([out_len]))[0]
                        elif want_times:
                            from m3asr_tpu.decode.ctc import (
                                ctc_greedy_search_times)
                            best = ctc_greedy_search_times(
                                out1[None], np.array([out_len]))[0]
                            hyp = list(best.tokens)
                            times = list(best.times)
                        else:
                            hyp = native.ctc_greedy_search(
                                out1[None], np.array([out_len]))[0]
                    lat_ms = round((time.perf_counter() - t0) * 1e3, 2)
                    cls = type(self)
                    with cls._active_lock:
                        cls._lat_ms.append(lat_ms)
                        cls._served += 1
                    resp = {"id": req.get("id"), "hyp": [int(t) for t in hyp],
                            "out_len": out_len,
                            "latency_ms": lat_ms}
                    if req.get("timestamps"):
                        # post-subsample frame indices (x subsample x
                        # 10 ms for wall-clock)
                        resp["times"] = [int(t) for t in times]
                    if want_conf:
                        # per-token posterior at the emission frame
                        if dmode == "argmax":
                            # emission frames are argmax frames: the
                            # best log-prob IS the token's posterior
                            resp["confidence"] = [
                                round(float(np.exp(aux1[t])), 4)
                                for t in times]
                        elif dmode == "topk":
                            from m3asr_tpu.decode.ctc import (
                                token_confidence_sparse)
                            resp["confidence"] = [
                                round(c, 4) for c in
                                token_confidence_sparse(out1, aux1, hyp,
                                                        times)]
                        else:
                            from m3asr_tpu.decode.ctc import (
                                token_confidence)
                            if mode != "beam":  # beam path already has lp
                                m = out1.max(-1, keepdims=True)
                                lp = out1 - m - np.log(
                                    np.exp(out1 - m).sum(-1,
                                                         keepdims=True))
                            resp["confidence"] = [
                                round(c, 4)
                                for c in token_confidence(lp, hyp, times)]
                    if nbest_out is not None:
                        resp["nbest"] = nbest_out
                except Exception as e:  # noqa: BLE001 — report to client
                    resp = {"id": None, "error": str(e)}
                self.wfile.write((json.dumps(resp) + "\n").encode())
                self.wfile.flush()

    return Handler


def _stream_moe_impl(engine, slots: int) -> str:
    """MoE dispatch for the batched streaming chunk programs — the
    shared measured auto policy at streaming token counts (chunk x
    slots, always far below the dense/tiled crossover): the float
    run-length kernel for float engines on TPU (round 5, measured
    device-side at chunk 16: bf16 1.03 ms/chunk vs int8's 1.54, fp32
    4.59 -> 2.17 — idle-expert DMA skip is decisive at 16-token
    chunks), dense off-TPU, quant/quant_a8 for int8/w8a8, and the
    packed-nibble Pallas kernel (quant4_pallas / quant4_a8) for
    int4/w4a8 on TPU."""
    if not engine.int8_experts:
        import jax
        return "runs_f" if jax.default_backend() == "tpu" else "dense"
    from m3asr_tpu.runtime.engine import moe_auto_impl
    chunk_tokens = 16 * max(1, slots)
    return moe_auto_impl("bfloat16", chunk_tokens, int8=True,
                         act_quant=engine.cfg.act_quant,
                         int4=engine.quant_bits == 4)


def _build_runtime(args):
    """Engine + micro-batcher + streaming pool, bundled so SIGHUP can
    rebuild the whole runtime from the (possibly updated) engine dir
    and swap it in without dropping the listener."""
    from m3asr_tpu.runtime.engine import Engine

    from m3asr_tpu.runtime.batching import MicroBatcher

    engine = Engine.load(args.plan_name)
    if args.warmup:
        # ALL buckets + one executed call: a cold batch bucket compiles
        # inside a live request otherwise, and AOT compilation alone
        # never stages the params — the GB-scale expert-weight
        # transfer then lands in the first request (measured: ~27 s
        # p99 outlier on a 16-client load test)
        engine.warmup(execute=True)
    # never collect more requests than the engine's largest batch
    # bucket can run in one call
    max_batch = min(args.max_batch, max(engine.buckets.batches))
    batcher = MicroBatcher(engine.infer, window_ms=args.batch_window_ms,
                           max_batch=max_batch,
                           beam_output=(engine.cfg.decode_output
                                        == "beam"))

    from m3asr_tpu.models.registry import dfsmn_stream_config, get_family
    family = get_family(engine.model_cfg.nnet_proto).name
    enc_cfg = engine.model_cfg.encoder_conf
    # streaming chunk forwards read the separate q/k/v weights and raw
    # "kernel" leaves — undo the batch-engine param transforms (exact
    # inverses; host-side, once at startup) for fuse_qkv / dense_quant
    # engines so one engine dir serves both batch and streaming
    stream_params = engine.params
    if getattr(engine.cfg, "fuse_qkv", False):
        from m3asr_tpu.ops.attention import defuse_qkv_params
        stream_params = defuse_qkv_params(stream_params)
    if getattr(engine.cfg, "dense_quant", False):
        from m3asr_tpu.ops.quant import dequantize_dense_params
        stream_params = dequantize_dense_params(stream_params,
                                                engine.dtype)
    if family.startswith("dfsmn"):
        # DFSMN streams (incl. MoE) share one batched chunk program per
        # chunk size — the same cross-stream micro-batching as the
        # conformer path (runtime/streaming_batch)
        from m3asr_tpu.runtime.streaming_batch import (
            BatchedDfsmnStreamingSession, DfsmnStreamBatcher)
        stream_cfg = dfsmn_stream_config(engine.model_cfg)
        dfsmn_impl = _stream_moe_impl(engine, args.stream_slots)
        dfsmn_batchers = {}
        dfsmn_lock = threading.Lock()

        def factory(chunk, left):
            with dfsmn_lock:
                if chunk not in dfsmn_batchers:
                    dfsmn_batchers[chunk] = DfsmnStreamBatcher(
                        stream_params, stream_cfg, chunk_size=chunk,
                        slots=args.stream_slots,
                        moe=(family == "dfsmn_moe"),
                        moe_impl=dfsmn_impl,
                        window_ms=args.stream_window_ms,
                        topk=args.stream_topk)
                b = dfsmn_batchers[chunk]
            return BatchedDfsmnStreamingSession(b)
    else:
        # quantized engines hold int8/int4 expert tensors — the chunk
        # forward must use the matching quant dispatch (int4 engages
        # the packed-nibble Pallas kernel on TPU: chunk token counts
        # are far below the dense/tiled crossover, the kernel's best
        # regime — round-2 VERDICT item 8)
        moe_impl = _stream_moe_impl(engine, args.stream_slots)
        # conformer-family streams share one batched chunk program per
        # (chunk, left) config: co-pending chunks from different
        # connections coalesce into ONE call (the streaming analogue of
        # MicroBatcher — B streams cost ~one stream of HBM traffic)
        from m3asr_tpu.runtime.streaming_batch import (
            BatchedStreamingSession, StreamBatcher)
        batchers = {}
        batchers_lock = threading.Lock()

        def factory(chunk, left):
            key = (chunk, left)
            with batchers_lock:
                if key not in batchers:
                    batchers[key] = StreamBatcher(
                        stream_params, enc_cfg, chunk_size=chunk,
                        num_left_chunks=left, slots=args.stream_slots,
                        moe=engine.is_moe, moe_impl=moe_impl,
                        window_ms=args.stream_window_ms,
                        topk=args.stream_topk)
                b = batchers[key]
            return BatchedStreamingSession(b)
    stream_pool = SessionPool(factory) if factory is not None else None
    return {"engine": engine, "batcher": batcher,
            "stream_pool": stream_pool}


def main(args):
    plat = os.environ.get("M3ASR_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    state = _build_runtime(args)

    lm = None
    if args.lm:
        from m3asr_tpu.decode.lm import NgramLM, read_symbol_table
        symtab = read_symbol_table(args.units) if args.units else None
        lm = NgramLM(args.lm, symtab)
        print(f"loaded {lm.order}-gram LM ({len(lm.logp)} ngrams)",
              flush=True)

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True   # in-flight handler threads must not
        # block process exit after shutdown (they hold batcher slots)

    with Server((args.host, args.port),
                make_handler(state, args.beam_size,
                             lm=lm,
                             default_lm_weight=args.lm_weight)) as srv:
        # graceful shutdown: SIGTERM/SIGINT stop accepting connections
        # and return from serve_forever (in-flight requests finish; the
        # reference stack has no serving layer at all, so the contract
        # here is the usual unix service one)
        import signal

        def _stop(signum, frame):
            import threading
            threading.Thread(target=srv.shutdown, daemon=True).start()

        # hot reload: SIGHUP rebuilds the runtime from the engine dir
        # (updated weights / quant mode / buckets) in a background
        # thread, then swaps it in; in-flight requests and open streams
        # finish on the old objects (the usual zero-downtime contract)
        reloading = threading.Lock()

        def _reload(signum, frame):
            def run():
                if not reloading.acquire(blocking=False):
                    print("reload already in progress", flush=True)
                    return
                try:
                    new = _build_runtime(args)
                    state.update(new)
                    print("engine reloaded", flush=True)
                except Exception as e:  # noqa: BLE001 — keep serving
                    print(f"engine reload FAILED (still serving the old "
                          f"weights): {e}", flush=True)
                finally:
                    reloading.release()
            threading.Thread(target=run, daemon=True).start()

        signal.signal(signal.SIGHUP, _reload)
        signal.signal(signal.SIGTERM, _stop)
        signal.signal(signal.SIGINT, _stop)
        print(f"serving on {args.host}:{srv.server_address[1]}",
              flush=True)
        srv.serve_forever()
        # bounded drain: finish in-flight requests plus anything that
        # arrives on open connections within a short quiet period (the
        # usual LB drain contract), but a stuck long-lived stream must
        # not wedge the shutdown past --drain_secs
        handler = srv.RequestHandlerClass
        grace = min(1.0, args.drain_secs)
        with handler._active_lock:
            handler.last_activity = time.time()
        deadline = time.time() + args.drain_secs
        while time.time() < deadline:
            if (handler.active == 0
                    and time.time() - handler.last_activity > grace):
                break
            time.sleep(0.05)
        print(f"shutdown: listener closed, {handler.active} "
              "request(s) still in flight", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-p", "--plan_name", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--warmup", action="store_true")
    p.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="co-arrival window for request micro-batching")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--stream_slots", type=int, default=8,
                   help="concurrent streams sharing one batched chunk "
                        "program (overflow streams get dedicated "
                        "single-stream sessions)")
    p.add_argument("--stream_topk", type=int, default=10,
                   help="on-device sparse chunk outputs: the chunk "
                        "program emits per-frame top-K log-softmax "
                        "(vals, ids) instead of (C, V) logits, cutting "
                        "the per-tick device->host transfer ~V/K x. "
                        "Greedy partials use column 0; beam partials "
                        "match the dense search for beam_size <= K "
                        "(larger beams degrade to K candidates/frame). "
                        "0 = dense logits")
    p.add_argument("--stream_window_ms", type=float, default=2.0,
                   help="co-pending window for cross-stream chunk "
                        "batching")
    p.add_argument("--lm", required=False,
                   help="ARPA n-gram LM: shallow fusion on beam "
                        "requests (per-request opt-out 'lm': false)")
    p.add_argument("--lm_weight", type=float, default=0.5)
    p.add_argument("--units", required=False,
                   help="symbol table mapping ARPA words to unit ids")
    p.add_argument("--drain_secs", type=float, default=10.0,
                   help="max seconds to let in-flight requests (and "
                        "requests arriving within a 1 s quiet window "
                        "on open connections) finish after "
                        "SIGTERM/SIGINT")
    main(p.parse_args())
