"""Int8/int4 weight quantization + fused dequant-matmul (Pallas TPU kernel).

TPU-native counterpart of the reference's quantized-GGUF support (Q5_K_M /
Q8_0 / Q4_K decoded inside llama.cpp, `src/download.rs:55-101`): weights are
stored int8 or packed int4, shrinking the HBM bytes that bound
autoregressive decode, and dequantised on the fly in VMEM so the
full-precision matrix never exists in HBM.

Layouts:
  int8: {"q": int8 [in, out], "scale": f32 [out]} — symmetric
        per-output-channel.
  int4: {"q4": int8 [in//2, out] packed BIASED nibbles (stored q+8 in
        [1, 15]; low nibble = row r, high nibble = row in//2 + r), "m8":
        int8 [in//GROUP4, out] per-(k-group, channel) sub-multipliers,
        "scale": f32 [out]} — Q4_K-class grouped quantization:
        w[k, n] ~= nib(k, n) * m8[k // GROUP4, n] * scale[n], nib in
        [-7, 7], m8 in [1, 127]. The bias makes in-kernel unpack branchless
        (`(raw & 0xF) - 8`), and the -8 folds out of the matmul entirely as
        `8 * rowsum(x_group)` (panel_matmul4).

        Two numerically-documented evaluation orders exist: dequant4_dt
        (XLA path: integer nib*m8 rounded ONCE through the model dtype,
        then matmul) and panel_matmul4 (kernels: per-group MXU dot of x
        against raw nibbles, m8 applied in f32 AFTER the dot — strictly
        less rounding). In f32 they agree to reduction-order ulp; in bf16
        they differ within the same deviation class as the fused kernels'
        other matmuls (see ops/fused_talker.py header).

`linear(x, w)` dispatches on weight type (dense array vs quantized dict) and
is the single matmul entry point used by the decoder stacks.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp

Weight = Union[jax.Array, Dict[str, jax.Array]]

_LANE = 128


GROUP4 = 128      # int4 k-group size (rows sharing one m8 sub-multiplier)


def is_quantized(w: Weight) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def is_quantized4(w: Weight) -> bool:
    return isinstance(w, dict) and "q4" in w and "scale" in w


def quantize(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8: w [in, out] -> q*scale == ~w."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)                     # [out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize(w: Dict[str, jax.Array]) -> jax.Array:
    return w["q"].astype(jnp.float32) * w["scale"]


# ------------------------------------------------------------------- int4
def quantize_int4(w: jax.Array) -> Dict[str, jax.Array]:
    """Grouped symmetric int4: w [K, N] (K % (2*GROUP4) == 0).

    w[k, n] ~= q4(k, n) * m8[k // GROUP4, n] * scale[n] with q4 in [-7, 7].
    """
    wf = jnp.asarray(w, jnp.float32)
    K, N = wf.shape
    assert K % (2 * GROUP4) == 0, (K, N)
    G = K // GROUP4
    amax_gn = jnp.max(jnp.abs(wf.reshape(G, GROUP4, N)), axis=1)     # [G, N]
    amax_n = jnp.max(amax_gn, axis=0)                                # [N]
    scale = jnp.maximum(amax_n, 1e-8) / (7.0 * 127.0)
    m8 = jnp.clip(jnp.round(amax_gn / (7.0 * scale)), 1, 127)
    step = m8 * scale                                                # [G, N]
    q = jnp.clip(jnp.round(wf / jnp.repeat(step, GROUP4, axis=0)), -7, 7)
    q = (q + 8.0).astype(jnp.int32)            # biased storage [1, 15]
    lo = q[: K // 2] & 0xF
    hi = q[K // 2:] & 0xF
    q4 = (lo | (hi << 4)).astype(jnp.uint8).astype(jnp.int8)
    return {"q4": q4, "m8": m8.astype(jnp.int8),
            "scale": scale.astype(jnp.float32)}


def unpack4(q4: jax.Array) -> jax.Array:
    """Packed biased [K//2, N] int8 -> [K, N] int8 nibbles in [-7, 7]."""
    qu = q4.astype(jnp.int32) & 0xFF
    lo = (qu & 0xF) - 8
    hi = ((qu >> 4) & 0xF) - 8
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def panel_matmul4(x_dt: jax.Array, w8: jax.Array, m8: jax.Array,
                  dt) -> jax.Array:
    """In-kernel int4 panel matmul: x [Bp, K] @ deq(packed [K//2, pw]).

    Shared by ops/fused_talker.py and ops/fused_predictor.py. The naive
    per-panel dequant ((nib*m8).astype(dt) then one big dot) costs ~10 VPU
    passes over K*pw int32 — measured to ERASE the int4 HBM-byte win on
    v5e (int4 frames slower than int8). This form keeps the VPU work to
    the branchless biased unpack (~4 passes, no concat/broadcast
    relayouts) and moves everything else to the MXU:

        y = sum_g m8[g] * ( x_g @ nib_u_g  -  8 * rowsum(x_g) )

    one [Bp, G4] @ [G4, pw] dot per k-group (the same MXU tiles the big
    dot would issue), with the storage bias folded out via the rowsum and
    m8 applied per group in f32 AFTER the dot (strictly less rounding
    than dequant4_dt's round-through-dt; agreement documented there).
    """
    Bp = x_dt.shape[0]
    K2, pw = w8.shape
    ng = m8.shape[0]
    ng2 = ng // 2
    assert K2 == ng2 * GROUP4, (w8.shape, m8.shape)

    # unpack cost is the int4 kernels' VPU bound (the HBM bytes are half of
    # int8 but every nibble still needs mask/shift/cast lane-ops), so keep
    # the pass count minimal: after & 0xFF the word is non-negative, so the
    # arithmetic >> 4 needs no second mask. (uint8 storage would also drop
    # the widening pass, but Mosaic has no uint8->bf16 cast lowering.)
    qu = w8.astype(jnp.int32) & 0xFF
    lo = (qu & 0xF).astype(dt)                 # biased nibbles [0..15]
    hi = (qu >> 4).astype(dt)
    mf = m8.astype(jnp.float32)                # [ng, pw]
    xf = x_dt.astype(jnp.float32)
    acc = jnp.zeros((Bp, pw), jnp.float32)
    for gi in range(ng):
        plane = lo if gi < ng2 else hi
        r0 = (gi % ng2) * GROUP4
        xg = x_dt[:, gi * GROUP4:(gi + 1) * GROUP4]
        part = jax.lax.dot_general(
            xg, plane[r0:r0 + GROUP4, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        bias = 8.0 * jnp.sum(xf[:, gi * GROUP4:(gi + 1) * GROUP4],
                             axis=1, keepdims=True)
        acc = acc + (part - bias) * mf[gi:gi + 1, :]
    return acc


def dequant4_dt(q4: jax.Array, m8: jax.Array, dt) -> jax.Array:
    """Canonical [K, N] dt weight (per-channel scale NOT applied): the
    integer product nib*m8 (<= 889) rounds once through dt."""
    nib = unpack4(q4).astype(jnp.int32)
    m = jnp.repeat(m8.astype(jnp.int32), GROUP4, axis=0)
    return (nib * m).astype(dt)


def dequantize4(w: Dict[str, jax.Array]) -> jax.Array:
    return (dequant4_dt(w["q4"], w["m8"], jnp.float32) * w["scale"])


def qmatmul4(x: jax.Array, w: Dict[str, jax.Array]) -> jax.Array:
    """x [..., in] @ int4-grouped [in, out] -> [..., out] f32.

    XLA reference path (kernels stream the same math panel-wise): dequant to
    x.dtype, matmul with f32 accumulation, per-channel scale at the end.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    wd = dequant4_dt(w["q4"], w["m8"], x2.dtype)
    acc = jax.lax.dot_general(x2, wd, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = acc * w["scale"]
    return out.reshape(*lead, w["q4"].shape[1])


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
    """Single matmul entry point: dense array, int8 or int4 dict."""
    if is_quantized(w):
        return qmatmul(x, w).astype(x.dtype)
    if is_quantized4(w):
        return qmatmul4(x, w).astype(x.dtype)
    return x @ w


_DECODER_MATMULS = ("wqkv", "wo", "w_gu", "w_down")


def quantize_decoder_params(params: Dict[str, Any],
                            kind: str = "int8") -> Dict[str, Any]:
    """Quantize a models/decoder pytree: the four stacked layer matmuls
    (per layer slice) and the output head; norms stay dense.
    kind: "int8" (per-channel) or "int4" (grouped, Q4_K-class)."""

    def q3(w):  # [L, in, out] -> per-(layer, out-channel) scales
        wf = jnp.asarray(w, jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=1)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(wf / scale[:, None, :]), -127, 127)
        return {"q": q.astype(jnp.int8), "scale": scale}

    def q3_int4(w):  # [L, in, out] -> stacked int4 dicts
        # sequential over layers (lax.map, not vmap): quantization builds
        # f32 temporaries of the full matrix, and a vmapped stack of them
        # OOMs HBM on real-size models (28 x [2048, 12288] f32 transients)
        return jax.lax.map(quantize_int4, jnp.asarray(w))

    qfn3 = q3 if kind == "int8" else q3_int4
    qfn2 = quantize if kind == "int8" else quantize_int4
    layers = dict(params["layers"])
    for name in _DECODER_MATMULS:
        layers[name] = qfn3(layers[name])
    return {
        "layers": layers,
        "final_norm": params["final_norm"],
        "head": qfn2(params["head"]),
    }
