"""Model-asset acquisition (HF hub) + local manifest resolution.

Mirror of the reference downloader's *model* layer (`src/download.rs:13-101`):
the same HF repo (`cgisky/qwen3-tts-custom-gguf`), per-quant manifest
(gguf / gguf_q5_k_m / gguf_q8_0), hf-mirror.com fallback probe, idempotent
skip-if-exists downloads. The reference's second layer — fetching
llama.cpp/onnxruntime *runtime binaries* (`src/download.rs:103-241`) —
disappears entirely on TPU: there is no native runtime to ship, XLA is the
runtime.

Network access is optional at import and call time: in hermetic/zero-egress
environments `check_and_download` verifies what exists locally and reports
what is missing instead of fetching.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request
from typing import Dict, List, Tuple

HF_BASE = "https://huggingface.co"
HF_MIRROR = "https://hf-mirror.com"
REPO = "cgisky/qwen3-tts-custom-gguf"

QUANT_DIRS = {
    "none": "gguf",
    "q5_k_m": "gguf_q5_k_m",
    "q8_0": "gguf_q8_0",
}


def manifest(quant: str = "none") -> List[Tuple[str, str]]:
    """(relative local path, repo path) pairs, per the reference manifest
    (src/download.rs:55-101)."""
    qdir = QUANT_DIRS.get(quant, "gguf")
    return [
        ("onnx/qwen3_tts_decoder.onnx", "onnx/qwen3_tts_decoder.onnx"),
        ("tokenizer/tokenizer.json", "tokenizer/tokenizer.json"),
        (f"{qdir}/qwen3_assets.gguf", f"{qdir}/qwen3_assets.gguf"),
        (f"{qdir}/qwen3_tts_talker.gguf", f"{qdir}/qwen3_tts_talker.gguf"),
        (f"{qdir}/qwen3_tts_predictor.gguf", f"{qdir}/qwen3_tts_predictor.gguf"),
    ]


class Downloader:
    def __init__(self, offline: bool | None = None, timeout: float = 5.0):
        self.timeout = timeout
        if offline is None:
            offline = os.environ.get("QWEN3_TTS_OFFLINE", "") == "1"
        self.offline = offline
        self.base = HF_BASE

    def _probe(self) -> None:
        """HF connectivity probe with mirror fallback
        (src/download.rs:17-38)."""
        for base in (HF_BASE, HF_MIRROR):
            try:
                req = urllib.request.Request(base, method="HEAD")
                urllib.request.urlopen(req, timeout=self.timeout)
                self.base = base
                return
            except (urllib.error.URLError, OSError):
                continue
        self.offline = True

    def missing(self, model_dir: str, quant: str = "none") -> List[str]:
        return [
            rel for rel, _ in manifest(quant)
            if not os.path.exists(os.path.join(model_dir, rel))
        ]

    def check_and_download(self, model_dir: str, quant: str = "none"
                           ) -> Dict[str, str]:
        """Fetch missing manifest entries (idempotent). Returns
        {relative path: status} with status in {exists, downloaded, missing}."""
        results: Dict[str, str] = {}
        todo = []
        for rel, repo_path in manifest(quant):
            local = os.path.join(model_dir, rel)
            if os.path.exists(local):
                results[rel] = "exists"
            else:
                todo.append((rel, repo_path, local))
        if not todo:
            return results
        if not self.offline:
            self._probe()
        for rel, repo_path, local in todo:
            if self.offline:
                results[rel] = "missing"
                continue
            url = f"{self.base}/{REPO}/resolve/main/{repo_path}"
            os.makedirs(os.path.dirname(local), exist_ok=True)
            try:
                tmp = local + ".part"
                urllib.request.urlretrieve(url, tmp)
                os.replace(tmp, local)
                results[rel] = "downloaded"
            except (urllib.error.URLError, OSError):
                results[rel] = "missing"
        return results
