"""llama.cpp-layout GGUF <-> decoder pytree conversion.

The reference loads its talker/predictor directly from llama.cpp GGUF files
(`src/models/llama/mod.rs:337-365` reads n_embd/n_head/n_layer/n_vocab from
metadata at load time); this module gives TtsEngine the same ability — a
downloaded `qwen3_tts_{talker,predictor}.gguf` is loadable without a separate
conversion step. tools/convert_weights.py re-exports these for the offline
converter CLI.

GGML stores weights [out, in] (numpy view after dim reversal); our decoder
layout (models/decoder.py) is [in, out], hence the transposes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from ..core.config import PredictorConfig, TalkerConfig
from . import gguf


def _meta(f: gguf.GGUFFile, *keys, default=None):
    for k in keys:
        for arch in ("qwen3", "llama", "qwen2"):
            v = f.metadata.get(f"{arch}.{k}")
            if v is not None:
                return v
        if k in f.metadata:
            return f.metadata[k]
    return default


def config_from_gguf(f: gguf.GGUFFile, kind: str):
    """Model geometry from GGUF metadata (mirrors llama.cpp's load)."""
    n_layer = int(_meta(f, "block_count"))
    hidden = int(_meta(f, "embedding_length"))
    n_head = int(_meta(f, "attention.head_count"))
    n_kv = int(_meta(f, "attention.head_count_kv", default=n_head))
    ffn = int(_meta(f, "feed_forward_length"))
    head_dim = int(_meta(f, "attention.key_length", default=hidden // n_head))
    theta = float(_meta(f, "rope.freq_base", default=1_000_000.0))
    vocab = int(f.tensors["output.weight"].shape[0]) \
        if "output.weight" in f.tensors else int(_meta(f, "vocab_size"))
    sections = _meta(f, "rope.dimension_sections")
    if sections is not None:
        sections = tuple(int(s) for s in sections)
        sections = sections + (0,) * (4 - len(sections))
    common = dict(
        hidden=hidden, n_layers=n_layer, n_q_heads=n_head, n_kv_heads=n_kv,
        head_dim=head_dim, ffn_dim=ffn, vocab=vocab, rope_theta=theta,
    )
    if kind == "talker":
        return TalkerConfig(
            **common,
            mrope_sections=sections or (24, 20, 20, 0),
        )
    return PredictorConfig(
        **common,
        mrope_sections=sections or (head_dim // 2, 0, 0, 0),
    )


def convert_llama_gguf(path: str, kind: str) -> Tuple[Any, Dict[str, Any]]:
    """llama.cpp GGUF -> (config, decoder params pytree as numpy arrays)."""
    f = gguf.GGUFFile(path)
    cfg = config_from_gguf(f, kind)
    L = cfg.n_layers

    def t(name):
        return np.ascontiguousarray(f.read_tensor(name).astype(np.float32).T)

    def raw(name):
        return f.read_tensor(name).astype(np.float32)

    layers: Dict[str, list] = {k: [] for k in (
        "ln1", "wqkv", "q_norm", "k_norm", "wo", "ln2", "w_gu", "w_down")}
    for i in range(L):
        p = f"blk.{i}."
        layers["ln1"].append(raw(p + "attn_norm.weight"))
        # decoder runs fused projections: [in, q|k|v] and [in, gate|up]
        layers["wqkv"].append(np.concatenate(
            [t(p + "attn_q.weight"), t(p + "attn_k.weight"),
             t(p + "attn_v.weight")], axis=1))
        layers["q_norm"].append(raw(p + "attn_q_norm.weight"))
        layers["k_norm"].append(raw(p + "attn_k_norm.weight"))
        layers["wo"].append(t(p + "attn_output.weight"))
        layers["ln2"].append(raw(p + "ffn_norm.weight"))
        layers["w_gu"].append(np.concatenate(
            [t(p + "ffn_gate.weight"), t(p + "ffn_up.weight")], axis=1))
        layers["w_down"].append(t(p + "ffn_down.weight"))

    params = {
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "final_norm": raw("output_norm.weight"),
        "head": t("output.weight"),
    }
    return cfg, params


def export_llama_gguf(path: str, cfg, params: Dict[str, Any],
                      arch: str = "qwen3") -> None:
    """Inverse mapping (testing + interop): our pytree -> llama.cpp names."""
    tensors: Dict[str, np.ndarray] = {}
    lw = params["layers"]
    nq_hd = cfg.n_q_heads * cfg.head_dim
    nk_hd = cfg.n_kv_heads * cfg.head_dim
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        tensors[p + "attn_norm.weight"] = np.asarray(lw["ln1"][i])
        wqkv = np.asarray(lw["wqkv"][i])
        tensors[p + "attn_q.weight"] = wqkv[:, :nq_hd].T
        tensors[p + "attn_k.weight"] = wqkv[:, nq_hd:nq_hd + nk_hd].T
        tensors[p + "attn_v.weight"] = wqkv[:, nq_hd + nk_hd:].T
        tensors[p + "attn_q_norm.weight"] = np.asarray(lw["q_norm"][i])
        tensors[p + "attn_k_norm.weight"] = np.asarray(lw["k_norm"][i])
        tensors[p + "attn_output.weight"] = np.asarray(lw["wo"][i]).T
        tensors[p + "ffn_norm.weight"] = np.asarray(lw["ln2"][i])
        w_gu = np.asarray(lw["w_gu"][i])
        F = w_gu.shape[1] // 2
        tensors[p + "ffn_gate.weight"] = w_gu[:, :F].T
        tensors[p + "ffn_up.weight"] = w_gu[:, F:].T
        tensors[p + "ffn_down.weight"] = np.asarray(lw["w_down"][i]).T
    tensors["output_norm.weight"] = np.asarray(params["final_norm"])
    tensors["output.weight"] = np.asarray(params["head"]).T
    meta = {
        f"{arch}.block_count": cfg.n_layers,
        f"{arch}.embedding_length": cfg.hidden,
        f"{arch}.attention.head_count": cfg.n_q_heads,
        f"{arch}.attention.head_count_kv": cfg.n_kv_heads,
        f"{arch}.attention.key_length": cfg.head_dim,
        f"{arch}.feed_forward_length": cfg.ffn_dim,
        f"{arch}.rope.freq_base": cfg.rope_theta,
        f"{arch}.rope.dimension_sections": list(cfg.mrope_sections),
    }
    gguf.write_gguf(path, tensors, meta)
