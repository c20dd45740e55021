"""HTTP serving daemon: continuous-batched streaming TTS over a socket.

New product surface (the reference is a one-shot CLI; SURVEY.md §0 "no
serving daemon"): a stdlib-only HTTP front-end over `serving.ServingEngine`.
A background scheduler thread ticks the device batch; request threads submit
streams and block on their results (or stream chunks as they are vocoded).

Endpoints:
  GET  /health            -> {"status": "ok", "active_streams": N}
  GET  /speakers          -> {"speakers": [names...]}
  POST /tts               -> audio/wav
       body: {"text": "...", "speaker": "vivian", "instruct": null,
              "stream": false}
       with "stream": true the WAV payload is chunked-transfer encoded as
       chunks are vocoded (~333 ms of audio each; header uses a max-length
       placeholder, standard for streaming WAV).

Run:  python -m qwen3_tts_tpu.server --tiny --random-weights --port 8973
"""

from __future__ import annotations

import argparse
import json
import queue
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .core import protocol as P
from .serving import ServingEngine


def wav_header(n_samples: int, sample_rate: int = P.SAMPLE_RATE) -> bytes:
    data_bytes = n_samples * 2
    return (b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                          sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", data_bytes))


def pcm16(samples: np.ndarray) -> bytes:
    return np.clip(samples * 32767.0, -32768, 32767).astype("<i2").tobytes()


class TtsServer:
    """Owns the engine, the serving batch, and the scheduler thread."""

    def __init__(self, engine, max_streams: int = 4):
        self.engine = engine
        self.serving = ServingEngine(engine, max_streams=max_streams)
        self._lock = threading.Lock()      # device access is single-threaded
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._scheduler, daemon=True)
        self._thread.start()

    def _scheduler(self) -> None:
        while not self._stop:
            with self._lock:
                active = self.serving.step()
            if active == 0:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def submit(self, text, voice, instruct=None, on_chunk=None):
        while True:
            with self._lock:
                sid = self.serving.submit(text, voice, instruct=instruct,
                                          on_chunk=on_chunk)
            if sid is not None:
                self._wake.set()
                return sid
            time.sleep(0.02)               # batch full: wait for a slot

    def wait(self, sid, timeout: float = 300.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            s = self.serving.streams.get(sid)
            if s is not None and s.done:
                return s
            time.sleep(0.01)
        raise TimeoutError(f"stream {sid} did not finish")

    def shutdown(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)


def make_handler(server: TtsServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # quiet by default
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {
                    "status": "ok",
                    "active_streams": server.serving.slots.active(),
                })
            elif self.path == "/speakers":
                self._json(200, {
                    "speakers": sorted(server.engine.speakers.keys()),
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/tts":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
            except (ValueError, KeyError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                voice = server.engine.get_speaker(req.get("speaker", "vivian"))
            except RuntimeError as e:
                self._json(400, {"error": str(e)})
                return
            instruct = req.get("instruct")

            if req.get("stream"):
                chunk_q: "queue.Queue" = queue.Queue()
                sid = server.submit(text, voice, instruct=instruct,
                                    on_chunk=chunk_q.put)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def send(chunk: bytes):
                    self.wfile.write(f"{len(chunk):X}\r\n".encode())
                    self.wfile.write(chunk + b"\r\n")

                # max-length header placeholder (players tolerate overlong
                # RIFF sizes on streamed WAV)
                max_samples = server.engine.max_steps * P.FRAME_SAMPLES
                send(wav_header(max_samples))
                done = False
                while not done:
                    try:
                        piece = chunk_q.get(timeout=0.05)
                        send(pcm16(piece))
                    except queue.Empty:
                        s = server.serving.streams.get(sid)
                        done = s is not None and s.done
                while not chunk_q.empty():
                    send(pcm16(chunk_q.get()))
                self.wfile.write(b"0\r\n\r\n")
                return

            sid = server.submit(text, voice, instruct=instruct)
            s = server.wait(sid)
            if s.error:
                self._json(500, {"error": s.error})
                return
            samples = s.result.samples
            payload = wav_header(len(samples)) + pcm16(samples)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="qwen3-tts-serve")
    ap.add_argument("--model-dir", default="models")
    ap.add_argument("--speakers-dir", default="speakers")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8973)
    ap.add_argument("--max-streams", type=int, default=4)
    ap.add_argument("--max-steps", type=int, default=512)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--warmup", action="store_true",
                    help="precompile before accepting requests")
    args = ap.parse_args(argv)

    from . import TtsEngine
    from .core.config import EngineConfig, tiny_engine_config

    config = tiny_engine_config() if args.tiny else EngineConfig()
    engine = TtsEngine(
        model_dir=None if args.random_weights else args.model_dir,
        config=config, random_weights=args.random_weights,
        speakers_dir=args.speakers_dir)
    engine.set_max_steps(args.max_steps)
    if args.warmup:
        print("warming up...", flush=True)
        engine.warmup()

    srv = TtsServer(engine, max_streams=args.max_streams)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(srv))
    print(f"qwen3-tts serving on http://{args.host}:{args.port} "
          f"(max {args.max_streams} concurrent streams)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
