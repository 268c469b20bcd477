"""serve.py daemon: requests over TCP get decoded responses."""

import json
import os
import re
import socket
import subprocess
import sys
import time

import numpy as np
import pytest
import torch
import yaml

from test_runtime import REPO, golden_model, small_yaml


@pytest.mark.slow
def test_serve_roundtrip(tmp_path):
    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    # tiny integer-id ARPA: the server-level LM fuses into beam requests
    with open(tmp_path / "lm.arpa", "w") as f:
        f.write("\\data\\\nngram 1=4\n\n\\1-grams:\n"
                "-0.5 1 -0.3\n-0.7 2 -0.2\n-1.0 <s> -0.1\n-0.9 </s>\n"
                "\n\\end\\\n")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "-p", str(tmp_path / "eng"), "--port", "0",
         "--lm", str(tmp_path / "lm.arpa"), "--lm_weight", "0.3"],
        stdout=subprocess.PIPE, text=True, env=env)
    try:
        line = proc.stdout.readline()
        assert "loaded 1-gram LM" in line, line
        line = proc.stdout.readline()
        mport = re.search(r":(\d+)$", line.strip())
        assert mport, line
        port = int(mport.group(1))

        rng = np.random.RandomState(0)
        with socket.create_connection(("127.0.0.1", port), timeout=120) as s:
            f = s.makefile("rw")
            # LM opt-out must also serve
            req = {"id": "nolm", "feat": rng.randn(40, 20).round(4).tolist(),
                   "decode": "beam", "beam_size": 4, "lm": False}
            f.write(json.dumps(req) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert "hyp" in resp, resp
            for i, mode in enumerate(["greedy", "beam"]):
                req = {"id": f"u{i}",
                       "feat": rng.randn(40, 20).round(4).tolist(),
                       "decode": mode, "beam_size": 4}
                f.write(json.dumps(req) + "\n")
                f.flush()
                resp = json.loads(f.readline())
                assert resp["id"] == f"u{i}", resp
                assert "hyp" in resp and resp["out_len"] == 9, resp
            # timestamps + context biasing (per-request fields)
            req = {"id": "ts", "feat": rng.randn(40, 20).round(4).tolist(),
                   "decode": "beam", "beam_size": 4, "timestamps": True,
                   "context": [[1, 2]], "context_bonus": 0.5}
            f.write(json.dumps(req) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert "times" in resp and len(resp["times"]) == len(
                resp["hyp"]), resp
            assert resp["times"] == sorted(resp["times"])
            req = {"id": "tg", "feat": rng.randn(40, 20).round(4).tolist(),
                   "decode": "greedy", "timestamps": True}
            f.write(json.dumps(req) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert "times" in resp and len(resp["times"]) == len(
                resp["hyp"]), resp
            # n-best list (beam): best-first scores, top-1 == hyp
            req = {"id": "nb", "feat": rng.randn(40, 20).round(4).tolist(),
                   "decode": "beam", "beam_size": 4, "nbest": 3}
            f.write(json.dumps(req) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            nb = resp.get("nbest")
            assert nb and len(nb) <= 3, resp
            assert nb[0]["hyp"] == resp["hyp"], resp
            scores = [h["score"] for h in nb]
            assert scores == sorted(scores, reverse=True)
            # per-token confidence (posterior at the emission frame)
            req = {"id": "cf", "feat": rng.randn(40, 20).round(4).tolist(),
                   "decode": "greedy", "confidence": True}
            f.write(json.dumps(req) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert len(resp["confidence"]) == len(resp["hyp"]), resp
            assert all(0.0 <= c <= 1.0 for c in resp["confidence"])
            assert "times" not in resp  # only sent when requested
            # long-form: input beyond the 64-frame max bucket routes
            # through engine.infer_long (windowed stitching)
            req = {"id": "long", "feat": rng.randn(150, 20).round(4).tolist(),
                   "decode": "greedy"}
            f.write(json.dumps(req) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert "hyp" in resp and resp["out_len"] > 20, resp
            # stats observability endpoint
            f.write('{"stats": true}\n')
            f.flush()
            resp = json.loads(f.readline())
            assert resp["request_batch_sizes"], resp
            assert "stream_batchers" in resp
            assert resp["served"] >= 6 and resp["uptime_s"] > 0
            assert resp["latency_ms"]["p50"] <= resp["latency_ms"]["p99"]
            # malformed request -> error response, server stays up
            f.write('{"id": "bad"}\n')
            f.flush()
            resp = json.loads(f.readline())
            assert "error" in resp
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.mark.slow
def test_serve_concurrent_requests_micro_batch(tmp_path):
    """Co-arriving clients are served through one batched engine call
    (and max_batch clamps to the engine's batch buckets)."""
    import threading

    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64,4x64",
         "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "-p", str(tmp_path / "eng"), "--port", "0",
         "--batch_window_ms", "200", "--max_batch", "64"],
        stdout=subprocess.PIPE, text=True, env=env)
    try:
        line = proc.stdout.readline()
        port = int(re.search(r":(\d+)$", line.strip()).group(1))
        rng = np.random.RandomState(1)
        feats = [rng.randn(30 + 2 * i, 20).round(4).tolist()
                 for i in range(6)]
        results = [None] * 6
        barrier = threading.Barrier(6)

        def client(i):
            barrier.wait()
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=180) as s:
                f = s.makefile("rw")
                f.write(json.dumps({"id": f"c{i}", "feat": feats[i]}) + "\n")
                f.flush()
                results[i] = json.loads(f.readline())

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        def sub4(T):
            return ((T - 3) // 2 + 1 - 3) // 2 + 1
        for i, resp in enumerate(results):
            assert resp is not None and "hyp" in resp, resp
            assert resp["id"] == f"c{i}"
            assert resp["out_len"] == sub4(30 + 2 * i), resp
    finally:
        proc.terminate()


@pytest.mark.slow
def test_serve_streaming_protocol(tmp_path):
    """Per-connection streaming: start/chunk/end yields partials and a
    final hyp; a second connection reuses the pooled (reset) session
    and must produce the identical transcript for identical input."""
    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "-p", str(tmp_path / "eng"), "--port", "0"],
        stdout=subprocess.PIPE, text=True, env=env)
    try:
        line = proc.stdout.readline()
        port = int(re.search(r":(\d+)$", line.strip()).group(1))
        rng = np.random.RandomState(3)
        feat = rng.randn(75, 20).round(4)  # > one 4*8+3 window

        def run_stream():
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=300) as s:
                f = s.makefile("rw")
                f.write(json.dumps({"stream": "start", "chunk_size": 8,
                                    "num_left_chunks": 2,
                                    "timestamps": True}) + "\n")
                f.flush()
                resp = json.loads(f.readline())
                assert resp.get("ok"), resp
                partials = []
                for i in range(0, feat.shape[0], 25):
                    f.write(json.dumps(
                        {"stream": "chunk",
                         "feat": feat[i:i + 25].tolist()}) + "\n")
                    f.flush()
                    resp = json.loads(f.readline())
                    assert "partial" in resp, resp
                    # streaming timestamps: one monotone frame per token
                    assert len(resp["times"]) == len(resp["partial"])
                    assert resp["times"] == sorted(resp["times"])
                    partials.append(resp["partial"])
                f.write(json.dumps({"stream": "end"}) + "\n")
                f.flush()
                resp = json.loads(f.readline())
                assert resp.get("final"), resp
                assert resp["out_frames"] > 0
                assert len(resp["times"]) == len(resp["hyp"])
                # partials are prefixes of the growing hypothesis
                assert partials[-1] == resp["hyp"][:len(partials[-1])]
                return resp["hyp"]

        h1 = run_stream()
        h2 = run_stream()  # pooled session, reset -> same transcript
        assert h1 == h2

        # incremental prefix-beam stream (same chunk program, beam
        # decode on the emitted logits; deterministic across runs)
        def run_beam_stream():
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=300) as s:
                f = s.makefile("rw")
                f.write(json.dumps({"stream": "start", "chunk_size": 8,
                                    "num_left_chunks": 2,
                                    "decode": "beam", "beam_size": 4,
                                    "timestamps": True}) + "\n")
                f.flush()
                assert json.loads(f.readline()).get("ok")
                for i in range(0, feat.shape[0], 25):
                    f.write(json.dumps(
                        {"stream": "chunk",
                         "feat": feat[i:i + 25].tolist()}) + "\n")
                    f.flush()
                    resp = json.loads(f.readline())
                    assert len(resp["times"]) == len(resp["partial"])
                f.write(json.dumps({"stream": "end"}) + "\n")
                f.flush()
                resp = json.loads(f.readline())
                assert resp.get("final")
                return resp["hyp"]

        b1 = run_beam_stream()
        b2 = run_beam_stream()
        assert b1 == b2

        # chunk without start on a fresh connection -> error, server up
        with socket.create_connection(("127.0.0.1", port),
                                      timeout=300) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"stream": "chunk",
                                "feat": feat[:10].tolist()}) + "\n")
            f.flush()
            assert "error" in json.loads(f.readline())
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.mark.slow
def test_serve_streaming_concurrent_batched(tmp_path):
    """Concurrent streams ride the shared batched chunk program
    (runtime/streaming_batch): every client's transcript equals its
    own serial run, under simultaneous interleaved chunk traffic."""
    import threading

    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "-p", str(tmp_path / "eng"), "--port", "0",
         "--stream_slots", "4", "--stream_window_ms", "30"],
        stdout=subprocess.PIPE, text=True, env=env)
    try:
        line = proc.stdout.readline()
        port = int(re.search(r":(\d+)$", line.strip()).group(1))
        rng = np.random.RandomState(5)
        feats = [rng.randn(60 + 15 * i, 20).round(4) for i in range(3)]

        def run_stream(feat, piece, barrier=None):
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=300) as s:
                f = s.makefile("rw")
                f.write(json.dumps({"stream": "start", "chunk_size": 8,
                                    "num_left_chunks": 2}) + "\n")
                f.flush()
                assert json.loads(f.readline()).get("ok")
                if barrier is not None:
                    barrier.wait()
                for i in range(0, feat.shape[0], piece):
                    f.write(json.dumps(
                        {"stream": "chunk",
                         "feat": feat[i:i + piece].tolist()}) + "\n")
                    f.flush()
                    json.loads(f.readline())
                f.write(json.dumps({"stream": "end"}) + "\n")
                f.flush()
                resp = json.loads(f.readline())
                assert resp.get("final"), resp
                return resp["hyp"]

        # serial references (each on a fresh pooled/reset session)
        refs = [run_stream(feats[i], 20 + 5 * i) for i in range(3)]

        results = [None] * 3
        barrier = threading.Barrier(3)

        def client(i):
            results[i] = run_stream(feats[i], 20 + 5 * i, barrier)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == refs
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.mark.slow
def test_serve_streaming_sparse_matches_dense(tmp_path):
    """--stream_topk (on-device sparse chunk outputs, the default) must
    produce byte-identical greedy AND beam transcripts to a dense
    (--stream_topk 0) server on the same engine and input."""
    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    rng = np.random.RandomState(9)
    feat = rng.randn(75, 20).round(4)

    def run_stream(port, decode):
        with socket.create_connection(("127.0.0.1", port),
                                      timeout=300) as s:
            f = s.makefile("rw")
            start = {"stream": "start", "chunk_size": 8,
                     "num_left_chunks": 2}
            if decode == "beam":
                start.update({"decode": "beam", "beam_size": 4})
            f.write(json.dumps(start) + "\n")
            f.flush()
            assert json.loads(f.readline()).get("ok")
            partials = []
            for i in range(0, feat.shape[0], 25):
                f.write(json.dumps(
                    {"stream": "chunk",
                     "feat": feat[i:i + 25].tolist()}) + "\n")
                f.flush()
                partials.append(json.loads(f.readline())["partial"])
            f.write(json.dumps({"stream": "end"}) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp.get("final"), resp
            return partials, resp["hyp"]

    outs = {}
    for name, topk in (("dense", "0"), ("sparse", "6")):
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "serve.py"),
             "-p", str(tmp_path / "eng"), "--port", "0",
             "--stream_topk", topk],
            stdout=subprocess.PIPE, text=True, env=env)
        try:
            line = proc.stdout.readline()
            port = int(re.search(r":(\d+)$", line.strip()).group(1))
            outs[name] = {d: run_stream(port, d)
                          for d in ("greedy", "beam")}
        finally:
            proc.terminate()
            proc.wait(timeout=10)
    assert outs["sparse"] == outs["dense"]


@pytest.mark.slow
def test_serve_streaming_dfsmn(tmp_path):
    """Streaming over a DFSMN engine (frame-aligned chunks, FIR delay
    handled by the session), and over a DFSMN-MoE engine (embed
    substream + router alignment inside the chunk program) — both via
    the shared DfsmnStreamBatcher."""
    from test_dfsmn_engine import dfsmn_yaml, golden_dfsmn

    m = golden_dfsmn()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(dfsmn_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "-p", str(tmp_path / "eng"), "--port", "0"],
        stdout=subprocess.PIPE, text=True, env=env)
    try:
        line = proc.stdout.readline()
        port = int(re.search(r":(\d+)$", line.strip()).group(1))
        rng = np.random.RandomState(4)
        feat = rng.randn(48, 16).round(4)
        with socket.create_connection(("127.0.0.1", port),
                                      timeout=300) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"stream": "start", "chunk_size": 8})
                    + "\n")
            f.flush()
            assert json.loads(f.readline()).get("ok")
            for i in range(0, feat.shape[0], 16):
                f.write(json.dumps({"stream": "chunk",
                                    "feat": feat[i:i + 16].tolist()})
                        + "\n")
                f.flush()
                resp = json.loads(f.readline())
                assert "partial" in resp, resp
            f.write(json.dumps({"stream": "end"}) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp.get("final") and resp["out_frames"] == 48, resp
    finally:
        proc.terminate()
        proc.wait(timeout=10)

    # DFSMN-MoE: streams through DfsmnMoeStreamingSession (embed
    # substream + router alignment inside the chunk program)
    import jax
    from test_dfsmn_moe import _moe_net_params
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    raw = {
        "nnet_proto": "dfsmn_san_fmoe_localComm_catEmbed",
        "input_dim": 12, "output_dim": 7,
        "model_conf": {
            "num_block": 2, "fsmn_each_block": 2,
            "fsmn_conf": {"hidden_dim": 24, "memory_dim": 16},
            "san_conf": {"num_head": 4, "num_memory": 8},
            "moe_conf": {"num_experts": 4},
            "embed_conf": {"num_block": 1, "fsmn_each_block": 2,
                           "hidden_dim": 24, "memory_dim": 16,
                           "num_head": 4, "num_memory": 8},
        },
    }
    eng = Engine(model_config_from_dict(raw), _moe_net_params(),
                 EngineConfig(bucket_lengths=(32,), bucket_batches=(1,),
                              donate_input=False))
    eng.save(str(tmp_path / "eng_moe"), raw_yaml=raw)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "-p", str(tmp_path / "eng_moe"), "--port", "0"],
        stdout=subprocess.PIPE, text=True, env=env)
    try:
        line = proc.stdout.readline()
        port = int(re.search(r":(\d+)$", line.strip()).group(1))
        rngm = np.random.RandomState(6)
        mfeat = rngm.randn(30, 12).round(4)
        with socket.create_connection(("127.0.0.1", port),
                                      timeout=300) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"stream": "start", "chunk_size": 8})
                    + "\n")
            f.flush()
            assert json.loads(f.readline()).get("ok")
            for i in range(0, mfeat.shape[0], 15):
                f.write(json.dumps({"stream": "chunk",
                                    "feat": mfeat[i:i + 15].tolist()})
                        + "\n")
                f.flush()
                resp = json.loads(f.readline())
                assert "partial" in resp, resp
            f.write(json.dumps({"stream": "end"}) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp.get("final") and resp["out_frames"] == 30, resp
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.mark.slow
def test_serve_graceful_shutdown(tmp_path):
    """SIGTERM: the listener stops, the open connection's in-flight
    request still gets its response (bounded drain), and the process
    exits 0 with the shutdown line on stdout."""
    import signal as _signal

    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "-p", str(tmp_path / "eng"), "--port", "0"],
        stdout=subprocess.PIPE, text=True, env=env)
    try:
        line = proc.stdout.readline()
        mport = re.search(r":(\d+)$", line.strip())
        assert mport, line
        port = int(mport.group(1))

        rng = np.random.RandomState(1)
        with socket.create_connection(("127.0.0.1", port),
                                      timeout=120) as s:
            f = s.makefile("rw")
            # warm the compile path so the post-signal request is fast
            req = {"id": "warm", "feat": rng.randn(40, 20).tolist(),
                   "decode": "greedy"}
            f.write(json.dumps(req) + "\n")
            f.flush()
            assert json.loads(f.readline())["id"] == "warm"
            # signal while the connection is open, then send one more
            # request down the live connection — drain must serve it
            proc.send_signal(_signal.SIGTERM)
            time.sleep(0.3)
            req["id"] = "inflight"
            f.write(json.dumps(req) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp["id"] == "inflight" and "hyp" in resp, resp
        assert proc.wait(timeout=30) == 0
        out = proc.stdout.read()
        assert "shutdown: listener closed" in out, out
        # new connections are refused after shutdown
        with pytest.raises(OSError):
            socket.create_connection(("127.0.0.1", port), timeout=2)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)


def test_stream_decode_endpoint_rule():
    """Unit-level: the trailing-blank endpoint rule over logits chunks
    (no server needed — _StreamDecode consumes raw chunk arrays)."""
    import serve as serve_mod

    def chunk(path, V=4):
        a = np.full((1, len(path), V), -5.0, np.float32)
        for t, s in enumerate(path):
            a[0, t, s] = 5.0
        return a

    d = serve_mod._StreamDecode(None, endpoint_blank_frames=3)
    d.update([chunk([0, 0, 0, 0])])     # leading silence: no endpoint
    assert not d.endpoint()
    d.update([chunk([1, 1, 0])])        # speech, then 1 blank
    assert not d.endpoint()
    d.update([chunk([0, 0])])           # 3 trailing blanks total
    assert d.endpoint()
    assert d.result()[0] == [1]
    d.update([chunk([2])])              # speech resumes: rearm
    assert not d.endpoint()
    # disabled by default
    d0 = serve_mod._StreamDecode(None)
    d0.update([chunk([1, 0, 0, 0, 0, 0, 0, 0])])
    assert not d0.endpoint()


@pytest.mark.slow
def test_serve_hot_reload(tmp_path):
    """SIGHUP swaps in updated weights from the engine dir without
    dropping the listener; post-reload responses match a fresh engine
    built from the new checkpoint."""
    import shutil
    import signal as _signal

    from golden import torch_ref as G

    raw = small_yaml()
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(raw, f)
    m1 = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m1.state_dict().items()},
               tmp_path / "ckpt1.pt")
    torch.manual_seed(77)
    m2 = G.randomize_(G.HierMoEConformer(
        20, 11, attention_dim=32, attention_heads=4, num_blocks=2,
        num_experts=4, moe_hidden=48,
        embed_conf=dict(attention_dim=24, attention_heads=4,
                        linear_units=32, num_blocks=1)), seed=78)
    torch.save({f"encoder.{k}": v for k, v in m2.state_dict().items()},
               tmp_path / "ckpt2.pt")
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    for i in (1, 2):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "build.py"),
             "-c", str(tmp_path / "cfg.yaml"),
             "-m", str(tmp_path / f"ckpt{i}.pt"),
             "-o", str(tmp_path / f"eng{i}"), "--buckets", "1x64",
             "--skip-warmup"],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr

    rng = np.random.RandomState(5)
    feat = rng.randn(40, 20).round(4).astype(np.float32)

    # expected post-reload transcript: decode with engine 2 in-process
    import jax
    jax.config.update("jax_platforms", "cpu")
    from m3asr_tpu.decode import native
    from m3asr_tpu.runtime.engine import Engine
    e2 = Engine.load(str(tmp_path / "eng2"))
    out, ol = e2.infer(feat[None], np.array([40]))
    expected = native.ctc_greedy_search(out, ol)[0]

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "-p", str(tmp_path / "eng1"), "--port", "0"],
        stdout=subprocess.PIPE, text=True, env=env)
    try:
        line = proc.stdout.readline()
        port = int(re.search(r":(\d+)$", line.strip()).group(1))
        with socket.create_connection(("127.0.0.1", port),
                                      timeout=120) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"id": "a", "feat": feat.tolist()}) + "\n")
            f.flush()
            r1 = json.loads(f.readline())
            assert "hyp" in r1

            # swap the weights under the engine dir, then SIGHUP
            shutil.copy(tmp_path / "eng2" / "params.npz",
                        tmp_path / "eng1" / "params.npz")
            proc.send_signal(_signal.SIGHUP)
            assert "engine reloaded" in proc.stdout.readline()

            f.write(json.dumps({"id": "b", "feat": feat.tolist()}) + "\n")
            f.flush()
            r2 = json.loads(f.readline())
            assert r2["hyp"] == [int(t) for t in expected], (r2, expected)
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.mark.slow
def test_serve_sparse_decode_engines(tmp_path):
    """Engines built with on-device decode outputs serve every request
    family: topk engines decode beam (sparse search) + greedy +
    timestamps + confidence + nbest; argmax engines decode greedy and
    reject beam with a clear error."""
    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    for dflag in ("topk", "argmax"):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "build.py"),
             "-c", str(tmp_path / "cfg.yaml"),
             "-m", str(tmp_path / "ckpt.pt"),
             "-o", str(tmp_path / f"eng_{dflag}"), "--buckets", "1x64",
             "--skip-warmup", "--decode_output", dflag,
             "--decode_topk", "4"],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, (dflag, r.stderr)

    rng = np.random.RandomState(7)
    feat = rng.randn(40, 20).round(4)

    def serve_requests(eng, reqs):
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "serve.py"),
             "-p", str(eng), "--port", "0"],
            stdout=subprocess.PIPE, text=True, env=env)
        try:
            line = proc.stdout.readline()
            mport = re.search(r":(\d+)$", line.strip())
            assert mport, line
            out = []
            with socket.create_connection(
                    ("127.0.0.1", int(mport.group(1))),
                    timeout=120) as s:
                f = s.makefile("rw")
                for req in reqs:
                    f.write(json.dumps(req) + "\n")
                    f.flush()
                    out.append(json.loads(f.readline()))
            return out
        finally:
            proc.terminate()
            proc.wait(timeout=10)

    fl = feat.tolist()
    topk = serve_requests(tmp_path / "eng_topk", [
        {"id": "g", "feat": fl, "decode": "greedy"},
        {"id": "b", "feat": fl, "decode": "beam", "beam_size": 4,
         "timestamps": True, "confidence": True, "nbest": 2},
        {"id": "big", "feat": fl, "decode": "beam", "beam_size": 9},
    ])
    am = serve_requests(tmp_path / "eng_argmax", [
        {"id": "g", "feat": fl, "decode": "greedy", "timestamps": True,
         "confidence": True},
        {"id": "b", "feat": fl, "decode": "beam"},
    ])
    assert "hyp" in topk[0] and topk[0]["out_len"] == 9, topk[0]
    assert "hyp" in topk[1] and len(topk[1]["times"]) == len(
        topk[1]["hyp"]), topk[1]
    assert len(topk[1]["confidence"]) == len(topk[1]["hyp"])
    assert all(0.0 <= c <= 1.0 for c in topk[1]["confidence"])
    nb = topk[1]["nbest"]
    assert nb and nb[0]["hyp"] == topk[1]["hyp"]
    # beam_size beyond the engine's K -> clear error, server stays up
    assert "decode_topk" in topk[2].get("error", ""), topk[2]
    # the argmax engine greedy-decodes the same transcript
    assert am[0]["hyp"] == topk[0]["hyp"], (am[0], topk[0])
    assert len(am[0]["confidence"]) == len(am[0]["hyp"])
    assert "argmax" in am[1].get("error", ""), am[1]


@pytest.mark.slow
def test_serve_device_beam_engine(tmp_path):
    """An engine built with --decode_output beam serves greedy (best
    hypothesis) and beam (+nbest) straight from the on-device search,
    and rejects host-search-only features with clear errors."""
    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    for dflag, eng in (("beam", "eng_beam"), ("logits", "eng_ref")):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "build.py"),
             "-c", str(tmp_path / "cfg.yaml"),
             "-m", str(tmp_path / "ckpt.pt"),
             "-o", str(tmp_path / eng), "--buckets", "1x64",
             "--skip-warmup", "--decode_output", dflag,
             "--decode_topk", "4"],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, (dflag, r.stderr)

    rng = np.random.RandomState(21)
    feat = rng.randn(44, 20).round(4)

    def serve_requests(eng, reqs):
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "serve.py"),
             "-p", str(eng), "--port", "0"],
            stdout=subprocess.PIPE, text=True, env=env)
        try:
            line = proc.stdout.readline()
            mport = re.search(r":(\d+)$", line.strip())
            assert mport, line
            out = []
            with socket.create_connection(
                    ("127.0.0.1", int(mport.group(1))),
                    timeout=120) as s:
                f = s.makefile("rw")
                for req in reqs:
                    f.write(json.dumps(req) + "\n")
                    f.flush()
                    out.append(json.loads(f.readline()))
            return out
        finally:
            proc.terminate()
            proc.wait(timeout=10)

    fl = feat.tolist()
    dev = serve_requests(tmp_path / "eng_beam", [
        {"id": "b", "feat": fl, "decode": "beam", "nbest": 3},
        {"id": "g", "feat": fl, "decode": "greedy"},
        {"id": "t", "feat": fl, "decode": "beam", "timestamps": True},
        {"id": "c", "feat": fl, "decode": "beam",
         "context": [[1, 2]]},
    ])
    ref = serve_requests(tmp_path / "eng_ref", [
        {"id": "b", "feat": fl, "decode": "beam", "beam_size": 4},
    ])
    # on-device beam == host beam over the reference engine's logits
    assert dev[0]["hyp"] == ref[0]["hyp"], (dev[0], ref[0])
    nb = dev[0].get("nbest")
    assert nb and nb[0]["hyp"] == dev[0]["hyp"], dev[0]
    assert all("score" in h for h in nb)
    # greedy requests get the best on-device hypothesis
    assert dev[1]["hyp"] == dev[0]["hyp"], (dev[1], dev[0])
    # host-search-only features are clearly rejected
    assert "topk" in dev[2].get("error", ""), dev[2]
    assert "topk" in dev[3].get("error", ""), dev[3]
