#!/usr/bin/env python
"""Import preset speaker voices from an existing Qwen3-TTS-Rust checkout.

The reference ships nine preset voices as `speakers/*.json` (vivian, serena,
uncle_fu, ryan, aiden, ono_anna, sohee, eric, dylan — speakers/index.json).
Those files are model-derived data (not code), consumed unchanged by our
VoiceFile loader; the repo vendors them byte-identical under `speakers/`
because preset synthesis requires them and the VoiceFile format must stay
JSON-compatible with them. This tool re-imports/validates them from a
reference checkout when the upstream presets change.

Usage:
  python tools/import_speakers.py --from /path/to/Qwen3-TTS-Rust/speakers \
      --to speakers/
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwen3_tts_tpu.utils.voice_file import VoiceFile  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="src", required=True,
                    help="reference speakers/ directory")
    ap.add_argument("--to", dest="dst", default="speakers")
    args = ap.parse_args(argv)

    os.makedirs(args.dst, exist_ok=True)
    imported = []
    for name in sorted(os.listdir(args.src)):
        if not name.endswith(".json"):
            continue
        src_path = os.path.join(args.src, name)
        if name == "index.json":
            shutil.copyfile(src_path, os.path.join(args.dst, name))
            continue
        try:
            v = VoiceFile.load(src_path)
        except (ValueError, KeyError, json.JSONDecodeError) as e:
            print(f"skip {name}: {e}", file=sys.stderr)
            continue
        if len(v.speaker_embedding) == 0:
            print(f"skip {name}: no speaker embedding", file=sys.stderr)
            continue
        shutil.copyfile(src_path, os.path.join(args.dst, name))
        imported.append((name[:-5], v.spk_id, len(v.speaker_embedding)))
    for name, sid, dim in imported:
        print(f"imported {name}: spk_id={sid}, emb[{dim}]")
    print(f"{len(imported)} voices -> {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
