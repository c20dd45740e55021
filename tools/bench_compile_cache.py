#!/usr/bin/env python
"""Cold vs warm-restart first-request latency with the persistent XLA
compilation cache (VERDICT r4 #6: the reference pays a dlopen at startup;
our equivalent is the jit compile of the fused programs — a restarted
process must not pay it again).

Runs the same child twice against one cache dir: flagship-geometry engine,
random weights, one short offline generation. Prints one JSON line with
both wall times and the breakdown the child reports.

Usage: python tools/bench_compile_cache.py [--steps 8] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
t_import = time.perf_counter()
from qwen3_tts_tpu.core.config import tiny_engine_config
from qwen3_tts_tpu.tts.engine import TtsEngine
from qwen3_tts_tpu.utils.voice_file import VoiceFile
cfg = tiny_engine_config() if %(tiny)r else None
t0 = time.perf_counter()
eng = TtsEngine(config=cfg, random_weights=True)
t_build = time.perf_counter()
eng.set_max_steps(%(steps)d)
dim = eng.config.talker.hidden
a = eng.generate_with_voice(
    "warm restart probe", VoiceFile(speaker_embedding=[0.0] * dim))
t_gen = time.perf_counter()
print(json.dumps({
    "build_s": round(t_build - t0, 2),
    "first_generate_s": round(t_gen - t_build, 2),
    "total_s": round(t_gen - t0, 2),
    "duration_s": a.duration(),
}))
"""


def run_child(cache: str, steps: int, tiny: bool) -> dict:
    env = dict(os.environ, QWEN3_TTS_COMPILE_CACHE=cache)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c",
         CHILD % {"repo": REPO, "steps": steps, "tiny": tiny}],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    out["wall_s"] = round(wall, 2)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    cache = tempfile.mkdtemp(prefix="qwen3_xla_cache_")
    cold = run_child(cache, args.steps, args.tiny)
    warm = run_child(cache, args.steps, args.tiny)
    print(json.dumps({
        "cache_dir": cache,
        "cache_entries": len(os.listdir(cache)),
        "cold": cold,
        "warm_restart": warm,
        "first_generate_speedup": round(
            cold["first_generate_s"] / max(warm["first_generate_s"], 1e-9),
            2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
