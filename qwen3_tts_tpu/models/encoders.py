"""Audio codec encoder + speaker encoder (voice-cloning front-ends).

TPU-native replacements for the reference's two ONNX sessions
(`src/models/onnx.rs:82-163`):

  * AudioEncoder:   waveform [N] f32 -> codes [N // 2000, 16] int
                    (input `input_values [1,N]`, output `audio_codes
                    [1, T//2000, 16]`, src/models/onnx.rs:97-121);
  * SpeakerEncoder: waveform -> internal log-mel [F, 128] -> spk_emb [2048]
                    (src/models/onnx.rs:140-163), mel math in models/mel.py.

Architectures are fresh TPU-first designs (strided-frame matmul front-ends +
bidirectional transformer encoders), not ONNX graph replays; the streaming /
shape contracts match the reference exactly. Both are optional at engine
load, mirroring the reference's `.ok()` semantics.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import checkpoint
from ..core.config import AudioEncoderConfig, EngineConfig, MelConfig, SpeakerEncoderConfig
from . import mel as mel_mod
from .decoder import rms_norm


# ----------------------------------------------------------------- encoder nn
def _init_encoder_stack(key, n_layers, hidden, n_heads, head_dim, ffn,
                        scale=0.02):
    ks = jax.random.split(key, 7)

    def w(k, shape):
        return (scale * jax.random.normal(k, shape)).astype(jnp.float32)

    return {
        "ln1": jnp.ones((n_layers, hidden)),
        "wqkv": w(ks[0], (n_layers, hidden, 3 * n_heads * head_dim)),
        "wo": w(ks[1], (n_layers, n_heads * head_dim, hidden)),
        "ln2": jnp.ones((n_layers, hidden)),
        "w_gate": w(ks[2], (n_layers, hidden, ffn)),
        "w_up": w(ks[3], (n_layers, hidden, ffn)),
        "w_down": w(ks[4], (n_layers, ffn, hidden)),
    }


def _encoder_stack(params, x, n_heads, head_dim, eps):
    """Bidirectional (non-causal) transformer over [B, T, H] via lax.scan."""
    B, T, H = x.shape

    def layer(h, lw):
        a = rms_norm(h, lw["ln1"], eps)
        qkv = (a @ lw["wqkv"]).reshape(B, T, 3, n_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bsnh,btnh->bnst", q, k) / jnp.sqrt(float(head_dim))
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bnst,btnh->bsnh", probs, v).reshape(B, T, -1)
        h = h + att @ lw["wo"]
        m = rms_norm(h, lw["ln2"], eps)
        h = h + (jax.nn.silu(m @ lw["w_gate"]) * (m @ lw["w_up"])) @ lw["w_down"]
        return h, None

    x, _ = jax.lax.scan(layer, x, params)
    return x


# -------------------------------------------------------------- audio encoder
def init_audio_encoder(key, cfg: AudioEncoderConfig, scale=0.02):
    ks = jax.random.split(key, 4)

    def w(k, shape):
        return (scale * jax.random.normal(k, shape)).astype(jnp.float32)

    return {
        # frame front-end: 2000 raw samples -> hidden (one matmul per frame)
        "frame_proj": w(ks[0], (cfg.frame_samples, cfg.hidden)),
        "frame_bias": jnp.zeros((cfg.hidden,)),
        "stack": _init_encoder_stack(
            ks[1], cfg.n_layers, cfg.hidden, cfg.n_heads, cfg.head_dim,
            cfg.ffn_dim, scale),
        "final_norm": jnp.ones((cfg.hidden,)),
        # 16 classification heads, one per codebook
        "code_heads": w(ks[2], (cfg.num_codebooks, cfg.hidden, cfg.code_vocab)),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames"))
def _audio_encode_jit(params, cfg: AudioEncoderConfig, audio: jax.Array,
                      n_frames: int) -> jax.Array:
    x = audio[: n_frames * cfg.frame_samples].reshape(1, n_frames,
                                                      cfg.frame_samples)
    h = x @ params["frame_proj"] + params["frame_bias"]
    h = _encoder_stack(params["stack"], h, cfg.n_heads, cfg.head_dim,
                       cfg.rms_eps)
    h = rms_norm(h, params["final_norm"], cfg.rms_eps)
    logits = jnp.einsum("bth,qhv->btqv", h, params["code_heads"])
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [1, T, 16]


class AudioEncoder:
    def __init__(self, params, cfg: AudioEncoderConfig):
        self.params = params
        self.cfg = cfg

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """wav [N] -> flat codes [T*16] int64, T = N // 2000
        (src/models/onnx.rs:97-121)."""
        audio = np.asarray(audio, np.float32)
        n_frames = len(audio) // self.cfg.frame_samples
        if n_frames == 0:
            return np.zeros((0,), np.int64)
        codes = _audio_encode_jit(self.params, self.cfg,
                                  jnp.asarray(audio), n_frames)
        return np.asarray(codes[0]).astype(np.int64).reshape(-1)


# ------------------------------------------------------------ speaker encoder
def init_speaker_encoder(key, cfg: SpeakerEncoderConfig, scale=0.02):
    ks = jax.random.split(key, 4)

    def w(k, shape):
        return (scale * jax.random.normal(k, shape)).astype(jnp.float32)

    return {
        "in_proj": w(ks[0], (cfg.n_mels, cfg.hidden)),
        "stack": _init_encoder_stack(
            ks[1], cfg.n_layers, cfg.hidden, cfg.n_heads, cfg.head_dim,
            cfg.ffn_dim, scale),
        "final_norm": jnp.ones((cfg.hidden,)),
        "out_proj": w(ks[2], (cfg.hidden, cfg.out_dim)),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def _speaker_encode_jit(params, cfg: SpeakerEncoderConfig,
                        mels: jax.Array) -> jax.Array:
    h = mels[None] @ params["in_proj"]                       # [1, F, hidden]
    h = _encoder_stack(params["stack"], h, cfg.n_heads, cfg.head_dim,
                       cfg.rms_eps)
    h = rms_norm(h, params["final_norm"], cfg.rms_eps)
    pooled = jnp.mean(h, axis=1)                             # [1, hidden]
    return (pooled @ params["out_proj"])[0]                  # [out_dim]


class SpeakerEncoder:
    def __init__(self, params, cfg: SpeakerEncoderConfig,
                 mel_cfg: MelConfig = MelConfig()):
        self.params = params
        self.cfg = cfg
        self.mel_cfg = mel_cfg

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """wav -> mel [F,128] -> spk_emb [out_dim]
        (src/models/onnx.rs:140-163)."""
        mels = mel_mod.compute_mel(np.asarray(audio, np.float32), self.mel_cfg)
        if mels.shape[0] == 0:
            return np.zeros((self.cfg.out_dim,), np.float32)
        emb = _speaker_encode_jit(self.params, self.cfg, jnp.asarray(mels))
        return np.asarray(emb, np.float32)


# ------------------------------------------------------------------- loading
def load_encoders(model_dir: str, config: EngineConfig
                  ) -> Tuple[AudioEncoder, SpeakerEncoder]:
    ae_path = os.path.join(model_dir, "audio_encoder.npz")
    se_path = os.path.join(model_dir, "speaker_encoder.npz")
    if not (os.path.exists(ae_path) and os.path.exists(se_path)):
        raise FileNotFoundError(f"encoder checkpoints not found in {model_dir}")
    like_a = jax.eval_shape(
        lambda: init_audio_encoder(jax.random.key(0), config.audio_encoder))
    like_s = jax.eval_shape(
        lambda: init_speaker_encoder(jax.random.key(0), config.speaker_encoder))
    ae = checkpoint.load_pytree(ae_path, like_a)
    se = checkpoint.load_pytree(se_path, like_s)
    return (AudioEncoder(ae, config.audio_encoder),
            SpeakerEncoder(se, config.speaker_encoder, config.mel))


def random_encoders(key, config: EngineConfig
                    ) -> Tuple[AudioEncoder, SpeakerEncoder]:
    k1, k2 = jax.random.split(key)
    return (
        AudioEncoder(init_audio_encoder(k1, config.audio_encoder),
                     config.audio_encoder),
        SpeakerEncoder(init_speaker_encoder(k2, config.speaker_encoder),
                       config.speaker_encoder, config.mel),
    )
