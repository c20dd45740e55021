#!/usr/bin/env python
"""Minimal library-API example: preset-speaker synthesis to WAV.

Equivalent of the reference README's CLI quick-start, via the Python API.
With converted checkpoints in ./models this runs the full-size model; pass
--demo to run on tiny random weights (no checkpoints needed).
"""

import argparse
import os
import sys

# runnable from any cwd: the repo root is this file's parent directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwen3_tts_tpu import SamplerConfig, TtsEngine, tiny_engine_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="models")
    ap.add_argument("--text", default="你好，欢迎使用 Qwen3-TTS")
    ap.add_argument("--speaker", default="vivian")
    ap.add_argument("--out", default="example.wav")
    ap.add_argument("--demo", action="store_true",
                    help="tiny random weights instead of checkpoints")
    args = ap.parse_args()

    if args.demo:
        engine = TtsEngine(config=tiny_engine_config(max_steps=24),
                           random_weights=True)
    else:
        engine = TtsEngine(model_dir=args.model_dir)
    engine.set_sampler_config(SamplerConfig(temperature=0.7, top_k=40,
                                            top_p=0.9, seed=42))
    try:
        voice = engine.get_speaker(args.speaker)
    except RuntimeError:
        from qwen3_tts_tpu import VoiceFile
        import numpy as np
        voice = VoiceFile(speaker_embedding=np.zeros(
            engine.models["assets"].text_table.shape[1]).tolist())

    audio = engine.generate_with_voice(args.text, voice)
    audio.save_wav(args.out)
    print(f"{audio.duration():.2f}s of audio -> {args.out}")


if __name__ == "__main__":
    main()
