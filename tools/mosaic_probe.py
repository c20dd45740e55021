#!/usr/bin/env python
"""Probe Mosaic/Pallas primitives the fused predictor kernel depends on.

Runs each probe in interpret mode AND compiled (if a TPU is present).
Not a test — a capability check for kernel design decisions.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import functools


def probe(name):
    def deco(fn):
        def run():
            for mode in ("interpret", "compiled"):
                if mode == "compiled" and jax.default_backend() == "cpu":
                    continue
                try:
                    fn(interpret=(mode == "interpret"))
                    print(f"  [{mode}] {name}: OK")
                except Exception as e:
                    msg = str(e).split("\n")[0][:140]
                    print(f"  [{mode}] {name}: FAIL - {type(e).__name__}: {msg}")
        return run
    return deco


@probe("hbm_scratch (pltpu.HBM in scratch_shapes + DMA rw)")
def p_hbm_scratch(interpret):
    def kernel(x_ref, o_ref, hbm, vbuf, sem):
        cp = pltpu.make_async_copy(x_ref, vbuf, sem)
        cp.start(); cp.wait()
        cp2 = pltpu.make_async_copy(vbuf, hbm, sem)
        cp2.start(); cp2.wait()
        cp3 = pltpu.make_async_copy(hbm, vbuf, sem)
        cp3.start(); cp3.wait()
        o_ref[:] = vbuf[:] * 2.0

    x = jnp.ones((64, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        scratch_shapes=[
            pltpu.HBM((64, 128), jnp.float32),
            pltpu.VMEM((64, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x)
    assert float(out[0, 0]) == 2.0, out[0, 0]


@probe("fori-var-indexed HBM DMA (w.at[i])")
def p_fori_dma(interpret):
    def kernel(w_hbm, o_ref, buf, sem):
        o_ref[:] = jnp.zeros_like(o_ref)

        def body(i, _):
            cp = pltpu.make_async_copy(w_hbm.at[i], buf, sem)
            cp.start(); cp.wait()
            o_ref[:] += buf[:]
            return ()
        jax.lax.fori_loop(0, 4, body, ())

    w = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(w)
    expect = w.sum(axis=0)
    assert jnp.allclose(out, expect), "mismatch"


@probe("row argmax via max+iota-min -> [B,1] int32")
def p_argmax(interpret):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        m = jnp.max(x, axis=-1, keepdims=True)
        iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        idx = jnp.min(jnp.where(x >= m, iota, x.shape[1]), axis=-1,
                      keepdims=True)
        o_ref[:] = jnp.broadcast_to(idx, o_ref.shape)

    x = jax.random.normal(jax.random.key(0), (8, 2048), jnp.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=interpret,
    )(x)
    expect = jnp.argmax(x, axis=-1)
    assert jnp.array_equal(out[:, 0], expect), (out[:, 0], expect)


@probe("dynamic sublane read (cos[pl.ds(pos,1),:]) + write")
def p_dyn_sublane(interpret):
    def kernel(c_ref, p_ref, o_ref, buf):
        pos = p_ref[0]
        row = c_ref[pl.ds(pos, 1), :]
        buf[:, pl.ds(pos, 1), :] = jnp.broadcast_to(row[None], (8, 1, 128))
        o_ref[:] = buf[:, pl.ds(pos, 1), :][:, 0]

    c = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    pos = jnp.array([7], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 32, 128), jnp.float32)],
        interpret=interpret,
    )(c, pos)
    assert jnp.allclose(out[0], c[7]), "row mismatch"


@probe("rotate-half concat on lanes")
def p_rot(interpret):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        h = x.shape[-1] // 2
        o_ref[:] = jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)

    x = jax.random.normal(jax.random.key(1), (8, 16, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 16, 128), jnp.float32),
        interpret=interpret,
    )(x)
    expect = jnp.concatenate([-x[..., 64:], x[..., :64]], axis=-1)
    assert jnp.allclose(out, expect)


@probe("one-hot from codes + matmul gather")
def p_onehot(interpret):
    def kernel(codes_ref, tab_ref, o_ref):
        codes = codes_ref[:, 0:1]                       # [8,1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 1)
        oh = (iota == codes).astype(jnp.float32)
        o_ref[:] = jnp.dot(oh, tab_ref[:],
                           preferred_element_type=jnp.float32)

    codes = jnp.array([[3], [7], [0], [255], [9], [1], [2], [4]], jnp.int32)
    codes = jnp.broadcast_to(codes, (8, 128))
    tab = jax.random.normal(jax.random.key(2), (256, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(codes, tab)
    assert jnp.allclose(out, tab[codes[:, 0]]), "gather mismatch"


@probe("dynamic-offset column DMA (head.at[:, pl.ds(q*2048+p,512)])")
def p_dyn_col_dma(interpret):
    def kernel(q_ref, w_hbm, o_ref, buf, sem):
        q = q_ref[0]
        cp = pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(q * 512 + 256, 256)], buf, sem)
        cp.start(); cp.wait()
        o_ref[:] = buf[:]

    w = jnp.arange(128 * 2048, dtype=jnp.float32).reshape(128, 2048)
    q = jnp.array([2], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((128, 256), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(q, w)
    assert jnp.allclose(out, w[:, 1280:1536]), "col slice mismatch"


@probe("int8 DMA panel + bf16 dot")
def p_int8_panel(interpret):
    def kernel(x_ref, w_hbm, o_ref, buf, sem):
        cp = pltpu.make_async_copy(w_hbm.at[:, pl.ds(0, 256)], buf, sem)
        cp.start(); cp.wait()
        o_ref[:] = jnp.dot(x_ref[:], buf[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    x = jax.random.normal(jax.random.key(3), (16, 512)).astype(jnp.bfloat16)
    w = jax.random.randint(jax.random.key(4), (512, 512), -127, 127, jnp.int8)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((512, 256), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, w)
    expect = jnp.dot(x.astype(jnp.float32), w[:, :256].astype(jnp.float32))
    assert jnp.allclose(out, expect, atol=2.0), "int8 dot mismatch"


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    for r in (p_hbm_scratch, p_fori_dma, p_argmax, p_dyn_sublane, p_rot,
              p_onehot, p_dyn_col_dma, p_int8_panel):
        r()
