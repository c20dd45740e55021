"""M-RoPE (multi-stream rotary position embedding).

The talker is driven with llama.cpp's `n_pos_per_embd=4` M-RoPE: four position
streams per token — temporal / height / width / channel — where the reference
sets t == h == w == sequence index and channel == 0
(`src/tts/engine.rs:306-314`). The rotary frequency budget (head_dim // 2) is
split into four contiguous sections, one per stream; frequency i rotates by
`pos[stream(i)] * theta^(-2i/head_dim)`.

With equal t/h/w positions and a zero-width channel section this reduces
exactly to standard RoPE, which is also how the predictor (normal positions,
`src/tts/engine.rs:316`) is expressed: sections (head_dim//2, 0, 0, 0).

Rotation uses the rotate-half convention (HF Qwen3): the head dim is split
into two halves that share the same frequency table.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mrope_positions(pos: jax.Array) -> jax.Array:
    """Expand sequence positions [..] -> 4-stream positions [4, ..] with the
    reference layout: t = h = w = pos, channel = 0."""
    pos = jnp.asarray(pos, jnp.int32)
    zeros = jnp.zeros_like(pos)
    return jnp.stack([pos, pos, pos, zeros], axis=0)


def section_ids(sections: Sequence[int]) -> np.ndarray:
    """Static map: rotary frequency index -> stream id, from section widths."""
    out = []
    for stream, width in enumerate(sections):
        out.extend([stream] * width)
    return np.asarray(out, np.int32)


def rope_angles(
    pos4: jax.Array,
    sections: Tuple[int, int, int, int],
    head_dim: int,
    theta: float,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for M-RoPE.

    Args:
      pos4: [4, B, S] int32 per-stream positions.
      sections: static 4-tuple summing to head_dim // 2.
    Returns:
      (cos, sin), each [B, S, head_dim] in the rotate-half layout
      (frequencies duplicated across the two halves).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    stream = jnp.asarray(section_ids(sections))              # [half]
    # pick each frequency's position stream: [B, S, half]
    pos_sel = jnp.take(pos4, stream, axis=0)                 # [half, B, S]
    pos_sel = jnp.moveaxis(pos_sel, 0, -1).astype(jnp.float32)
    ang = pos_sel * inv_freq                                 # [B, S, half]
    ang = jnp.concatenate([ang, ang], axis=-1)               # rotate-half layout
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half application. x: [B, S, n_heads, head_dim]; cos/sin [B, S, hd]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rotated * s
