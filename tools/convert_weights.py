#!/usr/bin/env python
"""Convert upstream Qwen3-TTS release weights into qwen3_tts_tpu checkpoints.

The reference downloads four weight artifacts from HF
(`src/download.rs:55-101`): `qwen3_tts_talker.gguf`, `qwen3_tts_predictor.gguf`
(llama.cpp layouts), `qwen3_assets.gguf` (embedding tables, consumed directly
by assets/tables.py — no conversion needed), and ONNX graphs for the
encoders/vocoder.

This tool maps the two llama.cpp GGUF transformers onto our decoder pytree
(models/decoder.py layout) and writes `talker.npz` / `predictor.npz`; the
model geometry is read from GGUF metadata the same way llama.cpp does
(`src/models/llama/mod.rs:337-365` reads n_embd/n_head/n_layer/n_vocab at
load). ONNX-packaged weights (vocoder, encoders) are converted from a torch
state_dict via `convert_torch_state_dict` once extracted (this container has
no onnx parser; any exporter that yields named torch tensors works).

Usage:
  python tools/convert_weights.py --talker qwen3_tts_talker.gguf \
      --predictor qwen3_tts_predictor.gguf --out models/
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwen3_tts_tpu.assets import checkpoint, gguf  # noqa: E402
from qwen3_tts_tpu.core.config import PredictorConfig, TalkerConfig  # noqa: E402


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


def convert_llama_gguf(path: str, kind: str
                       ) -> Tuple[Any, Dict[str, Any]]:
    """llama.cpp GGUF -> (config, decoder params pytree as numpy arrays).

    GGML stores weights [out, in] (numpy view after dim reversal); our
    decoder layout is [in, out], hence the transposes.
    """
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


def convert_vocoder_state_dict(sd: Dict[str, np.ndarray],
                               cfg=None) -> Dict[str, Any]:
    """Torch state dict of the codec decoder -> models/vocoder.py pytree.

    Expected naming (transformers-style export of the upstream codec
    decoder; adjust the prefixes below if the real checkpoint differs —
    `--dump-missing` prints every unmatched key):

      quantizer.codebooks.{q}.weight            [2048, 512]
      decoder.pre_conv.{weight,bias}            Conv1d OIH [1024, 512, 3]
      decoder.layers.{i}.input_layernorm.weight
      decoder.layers.{i}.self_attn.{q,k,v,o}_proj.weight   Linear [out, in]
      decoder.layers.{i}.self_attn.{q,k}_norm.weight
      decoder.layers.{i}.post_attention_layernorm.weight
      decoder.layers.{i}.mlp.{gate,up,down}_proj.weight
      decoder.norm.weight
      decoder.post_conv1.{weight,bias}          Conv1d [1024, 1024, 2*LA+1]
      decoder.post_conv2.{weight,bias}          Conv1d [1024, 1024, 3]
      decoder.upsample.{i}.{weight,bias}        ConvTranspose1d [in, out, s]

    Torch Linear stores [out, in] -> transposed into our [in, out]; q/k/v and
    gate/up fuse into the decoder's wqkv / w_gu; ConvTranspose1d (kernel ==
    stride) becomes the matmul form [C_in, s*C_out] used by the frame-local
    upsampler (w[c_in, c_out, j] -> w2[c_in, j*C_out + c_out]).
    """
    from qwen3_tts_tpu.core.config import VocoderConfig

    cfg = cfg or VocoderConfig()

    def T(name):
        return np.ascontiguousarray(np.asarray(sd[name], np.float32).T)

    def raw(name):
        return np.asarray(sd[name], np.float32)

    embed = np.stack([raw(f"quantizer.codebooks.{q}.weight")
                      for q in range(cfg.num_codebooks)])

    layers: Dict[str, list] = {k: [] for k in (
        "ln1", "wqkv", "q_norm", "k_norm", "wo", "ln2", "w_gu", "w_down")}
    for i in range(cfg.n_layers):
        p = f"decoder.layers.{i}."
        layers["ln1"].append(raw(p + "input_layernorm.weight"))
        layers["wqkv"].append(np.concatenate(
            [T(p + "self_attn.q_proj.weight"),
             T(p + "self_attn.k_proj.weight"),
             T(p + "self_attn.v_proj.weight")], axis=1))
        layers["q_norm"].append(raw(p + "self_attn.q_norm.weight"))
        layers["k_norm"].append(raw(p + "self_attn.k_norm.weight"))
        layers["wo"].append(T(p + "self_attn.o_proj.weight"))
        layers["ln2"].append(raw(p + "post_attention_layernorm.weight"))
        layers["w_gu"].append(np.concatenate(
            [T(p + "mlp.gate_proj.weight"), T(p + "mlp.up_proj.weight")],
            axis=1))
        layers["w_down"].append(T(p + "mlp.down_proj.weight"))

    up = []
    for i, s in enumerate(cfg.upsample_factors):
        w = np.asarray(sd[f"decoder.upsample.{i}.weight"], np.float32)
        c_in, c_out, k = w.shape
        assert k == s, f"upsample stage {i}: kernel {k} != stride {s}"
        up.append({
            "w": np.ascontiguousarray(
                w.transpose(0, 2, 1).reshape(c_in, s * c_out)),
            "b": np.tile(np.asarray(sd[f"decoder.upsample.{i}.bias"],
                                    np.float32), s),
        })

    return {
        "embed": embed,
        "pre_conv": {"w": raw("decoder.pre_conv.weight"),
                     "b": raw("decoder.pre_conv.bias")},
        "transformer": {
            "layers": {k: np.stack(v) for k, v in layers.items()},
            "final_norm": raw("decoder.norm.weight"),
            # the shared decoder module carries an (unused) head slot
            "head": np.zeros((cfg.hidden, 8), np.float32),
        },
        "post_a": {"w": raw("decoder.post_conv1.weight"),
                   "b": raw("decoder.post_conv1.bias")},
        "post_b": {"w": raw("decoder.post_conv2.weight"),
                   "b": raw("decoder.post_conv2.bias")},
        "up": up,
    }


def export_vocoder_state_dict(params: Dict[str, Any],
                              cfg=None) -> Dict[str, np.ndarray]:
    """Inverse of convert_vocoder_state_dict (round-trip testing)."""
    from qwen3_tts_tpu.core.config import VocoderConfig

    cfg = cfg or VocoderConfig()
    sd: Dict[str, np.ndarray] = {}
    for q in range(cfg.num_codebooks):
        sd[f"quantizer.codebooks.{q}.weight"] = np.asarray(
            params["embed"][q])
    sd["decoder.pre_conv.weight"] = np.asarray(params["pre_conv"]["w"])
    sd["decoder.pre_conv.bias"] = np.asarray(params["pre_conv"]["b"])
    lw = params["transformer"]["layers"]
    nq_hd = cfg.n_heads * cfg.head_dim
    for i in range(cfg.n_layers):
        p = f"decoder.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.asarray(lw["ln1"][i])
        wqkv = np.asarray(lw["wqkv"][i])
        sd[p + "self_attn.q_proj.weight"] = wqkv[:, :nq_hd].T
        sd[p + "self_attn.k_proj.weight"] = wqkv[:, nq_hd:2 * nq_hd].T
        sd[p + "self_attn.v_proj.weight"] = wqkv[:, 2 * nq_hd:].T
        sd[p + "self_attn.q_norm.weight"] = np.asarray(lw["q_norm"][i])
        sd[p + "self_attn.k_norm.weight"] = np.asarray(lw["k_norm"][i])
        sd[p + "self_attn.o_proj.weight"] = np.asarray(lw["wo"][i]).T
        sd[p + "post_attention_layernorm.weight"] = np.asarray(lw["ln2"][i])
        w_gu = np.asarray(lw["w_gu"][i])
        F = w_gu.shape[1] // 2
        sd[p + "mlp.gate_proj.weight"] = w_gu[:, :F].T
        sd[p + "mlp.up_proj.weight"] = w_gu[:, F:].T
        sd[p + "mlp.down_proj.weight"] = np.asarray(lw["w_down"][i]).T
    sd["decoder.norm.weight"] = np.asarray(params["transformer"]["final_norm"])
    sd["decoder.post_conv1.weight"] = np.asarray(params["post_a"]["w"])
    sd["decoder.post_conv1.bias"] = np.asarray(params["post_a"]["b"])
    sd["decoder.post_conv2.weight"] = np.asarray(params["post_b"]["w"])
    sd["decoder.post_conv2.bias"] = np.asarray(params["post_b"]["b"])
    for i, s in enumerate(cfg.upsample_factors):
        w2 = np.asarray(params["up"][i]["w"])          # [C_in, s*C_out]
        c_in = w2.shape[0]
        c_out = w2.shape[1] // s
        sd[f"decoder.upsample.{i}.weight"] = np.ascontiguousarray(
            w2.reshape(c_in, s, c_out).transpose(0, 2, 1))
        sd[f"decoder.upsample.{i}.bias"] = np.asarray(
            params["up"][i]["b"])[:c_out]
    return sd


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                             name_map: Dict[str, str]) -> Dict[str, Any]:
    """Generic torch-export hook: flat {torch_name: tensor} + {torch_name:
    'pytree/path'} -> nested numpy pytree for checkpoint.save_pytree."""
    out: Dict[str, Any] = {}
    for tname, path in name_map.items():
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(state_dict[tname])
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--talker")
    ap.add_argument("--predictor")
    ap.add_argument("--vocoder",
                    help=".npz of the codec-decoder torch state dict "
                         "(np.savez of {name: tensor})")
    ap.add_argument("--audio-encoder",
                    help=".npz of the codec-encoder torch state dict")
    ap.add_argument("--speaker-encoder",
                    help=".npz of the speaker-encoder torch state dict")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    for kind, path in (("talker", args.talker), ("predictor", args.predictor)):
        if not path:
            continue
        cfg, params = convert_llama_gguf(path, kind)
        out_path = os.path.join(args.out, f"{kind}.npz")
        checkpoint.save_pytree(out_path, params)
        print(f"{kind}: {path} -> {out_path}  ({cfg})")

    def _convert_sd(path, converter, out_name):
        sd = dict(np.load(path))
        try:
            params = converter(sd)
        except KeyError as e:
            got = "\n  ".join(sorted(sd))
            print(f"{out_name}: missing tensor {e}.\nState dict contains:"
                  f"\n  {got}\nAdjust the name map in tools/convert_weights"
                  f".py to match.", file=sys.stderr)
            raise SystemExit(2)
        out_path = os.path.join(args.out, out_name)
        checkpoint.save_pytree(out_path, params)
        print(f"{out_name[:-4]}: {path} -> {out_path}")

    if args.vocoder:
        _convert_sd(args.vocoder, convert_vocoder_state_dict, "vocoder.npz")
    if args.audio_encoder:
        from qwen3_tts_tpu.models import encoders as enc
        _convert_sd(args.audio_encoder, enc.convert_audio_encoder_state_dict,
                    "audio_encoder.npz")
    if args.speaker_encoder:
        from qwen3_tts_tpu.models import encoders as enc
        _convert_sd(args.speaker_encoder,
                    enc.convert_speaker_encoder_state_dict,
                    "speaker_encoder.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
