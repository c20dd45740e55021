#!/usr/bin/env python
"""Continuous-batching serving example: N concurrent streams on one device
batch, chunks delivered as they are vocoded (~333 ms of audio each).

The reference is strictly one-utterance-per-process; this surface is new
(PARITY.md "New first-class surface").
"""

import argparse
import os
import sys
import time

# runnable from any cwd: the repo root is this file's parent directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from qwen3_tts_tpu import SamplerConfig, TtsEngine, VoiceFile, tiny_engine_config
from qwen3_tts_tpu.serving import ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=3)
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--model-dir", default="models")
    args = ap.parse_args()

    if args.demo:
        engine = TtsEngine(config=tiny_engine_config(max_steps=12),
                           random_weights=True)
    else:
        engine = TtsEngine(model_dir=args.model_dir)
    engine.set_sampler_config(SamplerConfig(temperature=0.7, seed=0))
    dim = int(engine.models["assets"].text_table.shape[1])
    voice = VoiceFile(speaker_embedding=np.zeros(dim).tolist())

    srv = ServingEngine(engine, max_streams=args.slots)
    texts = [f"stream number {i}" for i in range(args.streams)]
    pending = list(enumerate(texts))
    t0 = time.time()

    def cb(i):
        return lambda piece: print(
            f"  [{time.time()-t0:6.2f}s] stream {i}: +{len(piece)} samples")

    sids = {}
    while pending or srv.slots.active() > 0:
        while pending:
            i, text = pending[0]
            sid = srv.submit(text, voice, on_chunk=cb(i))
            if sid is None:
                break
            sids[i] = sid
            pending.pop(0)
            print(f"  [{time.time()-t0:6.2f}s] admitted stream {i}")
        srv.step()

    for i, sid in sids.items():
        out = srv.result(sid)
        print(f"stream {i}: {out.duration():.2f}s audio")


if __name__ == "__main__":
    main()
