"""Isolate each fused-rasterizer kernel primitive and time it separately."""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PAGES = 56
N_TILES = 784 * 8
CHUNK = 8


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench(name, kernel_body, in_specs, out_spec, out_shape, args, oracle=None):
    def call(*a):
        return pl.pallas_call(
            kernel_body,
            grid=(N_TILES // CHUNK,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
        )(*a)

    f = jax.jit(call)
    args = tuple(jax.device_put(a) for a in args)
    try:
        out = np.asarray(f(*args))
        err = None if oracle is None else float(np.abs(out - oracle(*[np.asarray(a) for a in args])).max())
        t = timeit(f, *args)
        print(json.dumps({"name": name, "ms": round(t * 1e3, 3),
                          "us_per_tile": round(t * 1e6 / N_TILES, 4),
                          "max_err": err}), flush=True)
        return out
    except Exception as e:
        print(json.dumps({"name": name, "error": str(e)[:300]}), flush=True)
        return None


VM = pltpu.VMEM
SM = pltpu.SMEM


def main():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(PAGES, LANES)).astype(np.float32)
    pages = rng.integers(0, PAGES, size=(N_TILES, 8)).astype(np.int32)
    x = rng.normal(size=(N_TILES, 8, LANES)).astype(np.float32)
    il = rng.integers(0, LANES, size=(N_TILES, 8, LANES)).astype(np.int32)
    isub = rng.integers(0, 8, size=(N_TILES, 8, LANES)).astype(np.int32)

    # A. dynamic sublane slices from a resident table
    def k_dynslice(pages_ref, table_ref, out_ref):
        for c in range(CHUNK):
            rows = [table_ref[pl.ds(pages_ref[c, p], 1), :] for p in range(8)]
            out_ref[c] = jnp.concatenate(rows, axis=0)

    bench(
        "A_dyn_sublane_slice",
        k_dynslice,
        [pl.BlockSpec((CHUNK, 8), lambda i: (i, 0), memory_space=SM),
         pl.BlockSpec((PAGES, LANES), lambda i: (0, 0), memory_space=VM)],
        pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
        jax.ShapeDtypeStruct((N_TILES, 8, LANES), jnp.float32),
        (pages, table),
        oracle=lambda p, t: t[p],
    )

    # B. iota-compare one-hot + matmul (static data, no slices)
    def k_onehot(x_ref, il_ref, out_ref):
        for c in range(CHUNK):
            ws = x_ref[c]
            outs = []
            for r in range(8):
                m = (
                    jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                    == il_ref[c, r : r + 1, :]
                ).astype(jnp.float32)
                t = jnp.dot(ws, m, preferred_element_type=jnp.float32)
                outs.append(t[r : r + 1, :])
            out_ref[c] = jnp.concatenate(outs, axis=0)

    bench(
        "B_onehot_matmul",
        k_onehot,
        [pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
         pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM)],
        pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
        jax.ShapeDtypeStruct((N_TILES, 8, LANES), jnp.float32),
        (x, il),
    )

    # C. take_along_axis on lanes (dynamic_gather)
    def k_taa_lane(x_ref, il_ref, out_ref):
        for c in range(CHUNK):
            out_ref[c] = jnp.take_along_axis(x_ref[c], il_ref[c], axis=1)

    bench(
        "C_taa_lane",
        k_taa_lane,
        [pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
         pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM)],
        pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
        jax.ShapeDtypeStruct((N_TILES, 8, LANES), jnp.float32),
        (x, il),
        oracle=lambda a, b: np.take_along_axis(a, b, axis=2),
    )

    # C2. take_along_axis on sublanes
    def k_taa_sub(x_ref, is_ref, out_ref):
        for c in range(CHUNK):
            out_ref[c] = jnp.take_along_axis(x_ref[c], is_ref[c], axis=0)

    bench(
        "C2_taa_sublane",
        k_taa_sub,
        [pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
         pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM)],
        pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
        jax.ShapeDtypeStruct((N_TILES, 8, LANES), jnp.float32),
        (x, isub),
        oracle=lambda a, b: np.take_along_axis(a, b, axis=1),
    )

    # D. select-reduce over sublanes (iota-compare, no matmul)
    def k_selred(x_ref, is_ref, out_ref):
        for c in range(CHUNK):
            outs = []
            for r in range(8):
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
                    == is_ref[c, r : r + 1, :]
                )
                outs.append(
                    jnp.sum(jnp.where(sel, x_ref[c], 0.0), axis=0, keepdims=True)
                )
            out_ref[c] = jnp.concatenate(outs, axis=0)

    bench(
        "D_select_reduce",
        k_selred,
        [pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
         pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM)],
        pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
        jax.ShapeDtypeStruct((N_TILES, 8, LANES), jnp.float32),
        (x, isub),
    )

    # E. RMW accumulate at dynamic rows into a resident output
    def k_rmw(pages_ref, x_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        for c in range(CHUNK):
            for p in range(8):
                row = out_ref[pl.ds(pages_ref[c, p], 1), :]
                out_ref[pl.ds(pages_ref[c, p], 1), :] = row + x_ref[c, p : p + 1, :]

    bench(
        "E_rmw_dynamic_rows",
        k_rmw,
        [pl.BlockSpec((CHUNK, 8), lambda i: (i, 0), memory_space=SM),
         pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM)],
        pl.BlockSpec((PAGES, LANES), lambda i: (0, 0), memory_space=VM),
        jax.ShapeDtypeStruct((PAGES, LANES), jnp.float32),
        (pages, x),
    )

    # F. baseline: pure elementwise on same block sizes (roofline anchor)
    def k_base(x_ref, out_ref):
        out_ref[...] = x_ref[...] * 2.0 + 1.0

    bench(
        "F_elementwise_baseline",
        k_base,
        [pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM)],
        pl.BlockSpec((CHUNK, 8, LANES), lambda i: (i, 0, 0), memory_space=VM),
        jax.ShapeDtypeStruct((N_TILES, 8, LANES), jnp.float32),
        (x,),
    )


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    main()
