"""HTTP serving daemon: health/speakers/tts endpoints, concurrent requests,
streaming transfer, error paths — via a real socket."""

import http.client
import json
import threading

import numpy as np
import pytest
from http.server import ThreadingHTTPServer

from qwen3_tts_tpu import SamplerConfig, TtsEngine, tiny_engine_config
from qwen3_tts_tpu import server as server_mod

CFG = tiny_engine_config(max_steps=6)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    sdir = tmp_path_factory.mktemp("speakers")
    emb = np.random.default_rng(0).normal(size=64).astype(np.float32)
    (sdir / "vivian.json").write_text(json.dumps(
        {"name": "vivian", "spk_emb": emb.tolist()}))
    engine = TtsEngine(config=CFG, random_weights=True, seed=0,
                       speakers_dir=str(sdir))
    engine.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                            top_p=1.0, seed=1))
    srv = server_mod.TtsServer(engine, max_streams=2)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                server_mod.make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()
    srv.shutdown()


def _req(port, method, path, body=None):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    c.request(method, path,
              body=json.dumps(body) if body is not None else None)
    r = c.getresponse()
    data = r.read()
    c.close()
    return r.status, r.getheader("Content-Type"), data


def test_health(served):
    status, ctype, data = _req(served, "GET", "/health")
    assert status == 200
    assert json.loads(data)["status"] == "ok"


def test_speakers(served):
    status, _, data = _req(served, "GET", "/speakers")
    assert json.loads(data)["speakers"] == ["vivian"]


def test_tts_roundtrip(served):
    status, ctype, data = _req(served, "POST", "/tts",
                               {"text": "hello server"})
    assert status == 200 and ctype == "audio/wav"
    assert data[:4] == b"RIFF"
    n_samples = (len(data) - 44) // 2
    assert n_samples > 0 and n_samples % 2000 == 0


def test_concurrent_requests(served):
    results = {}

    def hit(i):
        results[i] = _req(served, "POST", "/tts", {"text": f"req {i}"})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 3
    for status, ctype, data in results.values():
        assert status == 200 and data[:4] == b"RIFF"


def test_streaming_response(served):
    status, ctype, data = _req(served, "POST", "/tts",
                               {"text": "stream me", "stream": True})
    assert status == 200 and ctype == "audio/wav"
    assert data[:4] == b"RIFF"
    assert len(data) > 44          # header + at least one chunk


def test_bad_request(served):
    status, _, data = _req(served, "POST", "/tts", {"no_text": 1})
    assert status == 400
    status, _, _ = _req(served, "GET", "/nope")
    assert status == 404


def test_admission_timeout_no_spin(tmp_path):
    """A full batch rejects new submissions after admit_timeout (bounded
    admission, VERDICT r2 #9) instead of spinning forever."""
    sdir = tmp_path / "spk"
    sdir.mkdir()
    (sdir / "vivian.json").write_text(json.dumps(
        {"name": "vivian", "spk_emb": np.zeros(64).tolist()}))
    engine = TtsEngine(config=CFG, random_weights=True, seed=2,
                       speakers_dir=str(sdir))
    engine.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                            top_p=1.0, seed=1))
    srv = server_mod.TtsServer(engine, max_streams=1, admit_timeout=0.2)
    # stop the scheduler so the single slot never drains
    srv._stop = True
    with srv._cond:
        srv._cond.notify_all()
    srv._thread.join(timeout=10)
    voice = engine.get_speaker("vivian")
    assert srv.serving.submit("occupies the slot", voice) is not None
    t0 = __import__("time").monotonic()
    with pytest.raises(TimeoutError):
        srv.submit("rejected", voice)
    assert __import__("time").monotonic() - t0 < 5.0


def test_stats_endpoint(server_fixture_or_none=None):
    """GET /stats: serving counters advance as streams complete."""
    import json as _json
    import urllib.request

    from qwen3_tts_tpu import SamplerConfig, TtsEngine, tiny_engine_config
    from qwen3_tts_tpu.server import TtsServer, make_handler
    from http.server import ThreadingHTTPServer
    import threading

    eng = TtsEngine(config=tiny_engine_config(max_steps=6),
                    random_weights=True, seed=2)
    eng.set_sampler_config(SamplerConfig(temperature=0.0, top_k=0,
                                         top_p=1.0, seed=1))
    srv = TtsServer(eng, max_streams=2)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def stats():
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=30) as r:
                return _json.loads(r.read())

        s0 = stats()
        assert s0["streams_served"] == 0
        assert s0["max_streams"] == 2
        assert s0["uptime_s"] >= 0

        from qwen3_tts_tpu.utils.voice_file import VoiceFile
        sid = srv.submit("stats probe",
                         VoiceFile(speaker_embedding=[0.0] * 64))
        srv.wait(sid, timeout=120)
        s1 = stats()
        assert s1["streams_served"] == 1
        assert s1["frames_served"] > 0
        assert s1["audio_seconds_served"] > 0
    finally:
        httpd.shutdown()
        srv.shutdown()
