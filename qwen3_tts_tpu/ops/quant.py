"""Int8 weight quantization + fused dequant-matmul (Pallas TPU kernel).

TPU-native counterpart of the reference's quantized-GGUF support (Q5_K_M /
Q8_0 decoded inside llama.cpp, `src/download.rs:55-101`): weights are stored
int8 with per-output-channel f32 scales, halving the HBM bytes that bound
autoregressive decode, and dequantised on the fly in VMEM by a Pallas kernel
so the full-precision matrix never exists in HBM.

Layout: QuantizedLinear = {"q": int8 [in, out], "scale": f32 [out]}.
`linear(x, w)` dispatches on weight type (dense array vs quantized dict) and
is the single matmul entry point used by the decoder stacks.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp

Weight = Union[jax.Array, Dict[str, jax.Array]]

_LANE = 128


def is_quantized(w: Weight) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def quantize(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8: w [in, out] -> q*scale == ~w."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)                     # [out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize(w: Dict[str, jax.Array]) -> jax.Array:
    return w["q"].astype(jnp.float32) * w["scale"]


def quantize_tree(params: Any, min_size: int = 1 << 16) -> Any:
    """Quantize every 2-D/3-D weight matrix above min_size elements; norms,
    biases and small tensors stay dense. 3-D [L, in, out] tensors quantize
    per layer slice (scale [L, out])."""

    def quantize_leaf(x):
        arr = jnp.asarray(x)
        if arr.ndim == 2 and arr.size >= min_size:
            return quantize(arr)
        if arr.ndim == 3 and arr.size >= min_size:
            wf = arr.astype(jnp.float32)
            amax = jnp.max(jnp.abs(wf), axis=1)             # [L, out]
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(wf / scale[:, None, :]), -127, 127)
            return {"q": q.astype(jnp.int8), "scale": scale}
        return x

    return jax.tree_util.tree_map(quantize_leaf, params)


# ---------------------------------------------------------------- pallas path
def _qmatmul_kernel(x_ref, q_ref, scale_ref, out_ref):
    """One output tile: out[M, TN] = (x[M, K] @ deq(q[K, TN])) * scale[TN].

    The int8 tile is converted to bf16 in VMEM — HBM only ever carries int8.
    """
    x = x_ref[:]
    q = q_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x, q, preferred_element_type=jnp.float32)
    out_ref[:] = acc * scale_ref[:]


def _pallas_qmatmul(x: jax.Array, q: jax.Array, scale: jax.Array,
                    tile_n: int = 512, interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = q.shape[1]
    tile_n = min(tile_n, N)
    # pad M to the bf16 sublane minimum (16) so tiles are well-formed
    m_pad = max(16, ((M + 15) // 16) * 16)
    if m_pad != M:
        x = jnp.pad(x, ((0, m_pad - M), (0, 0)))
    scale2 = scale.reshape(1, N)
    grid = (pl.cdiv(N, tile_n),)
    out = pl.pallas_call(
        _qmatmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * K * N,
            bytes_accessed=m_pad * K * 2 + K * N + N * 4 + m_pad * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), q, scale2)
    return out[:M]


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except RuntimeError:
        return False


def qmatmul(x: jax.Array, w: Dict[str, jax.Array]) -> jax.Array:
    """x [..., in] @ quantized [in, out] -> [..., out] float32."""
    q, scale = w["q"], w["scale"]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    K, N = q.shape
    if (_use_pallas() and K % _LANE == 0 and N % _LANE == 0):
        out = _pallas_qmatmul(x2, q, scale)
    else:
        out = (x2.astype(jnp.float32) @ q.astype(jnp.float32)) * scale
    return out.reshape(*lead, N)


def linear(x: jax.Array, w: Weight) -> jax.Array:
    """Single matmul entry point: dense array or QuantizedLinear dict."""
    if is_quantized(w):
        return qmatmul(x, w).astype(x.dtype)
    return x @ w


_DECODER_MATMULS = ("wqkv", "wo", "w_gu", "w_down")


def quantize_decoder_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Int8-quantize a models/decoder pytree: the four stacked layer
    matmuls (per layer slice) and the output head; norms stay dense."""

    def q3(w):  # [L, in, out] -> per-(layer, out-channel) scales
        wf = jnp.asarray(w, jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=1)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(wf / scale[:, None, :]), -127, 127)
        return {"q": q.astype(jnp.int8), "scale": scale}

    layers = dict(params["layers"])
    for name in _DECODER_MATMULS:
        layers[name] = q3(layers[name])
    return {
        "layers": layers,
        "final_norm": params["final_norm"],
        "head": quantize(params["head"]),
    }
