"""Probe Mosaic support + speed for the fused-rasterizer kernel primitives.

1. dynamic sublane slice: ws = table_ref[pl.ds(page, P), :] with page from SMEM
2. one-hot gather via MXU: t = ws @ M, M[l, k] = (l == idx_k)
3. sublane select-reduce: out[k] = sum_s (s == ps_k) * t[s, k]
4. RMW accumulate at dynamic row: out_ref[pl.ds(p, P), :] += g
5. in-kernel take_along_axis axis=1 / axis=0 on (8, 128)
Each validated vs numpy and timed standalone.
"""

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

P_HAT = 8
LANES = 128
PAGES = 56
N_TILES = 784 * 8  # batch-8 worth of tiles, to get a stable timing


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def gather_kernel(pages_ref, idx_ref, table_ref, out_ref, dtab_ref, *, chunk):
    # zero the accumulator once (grid step 0)
    @pl.when(pl.program_id(0) == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    for c in range(chunk):
        # 1. page workspace via P_HAT dynamic sublane slices
        rows = [
            table_ref[pl.ds(pages_ref[c, p], 1), :] for p in range(P_HAT)
        ]
        ws = jnp.concatenate(rows, axis=0)  # (P_HAT, 128)

        flat = idx_ref[c]  # (8, 128) int32: ps*128 + lane (8 "corner rows")
        ps = flat >> 7
        lane = flat & 127

        rows_out = []
        for r in range(8):
            l_r = lane[r : r + 1, :]  # (1, 128)
            # 2. one-hot M[l, k] = (l == l_r[k]); t = ws @ M
            m = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                == l_r
            ).astype(jnp.float32)
            t = jnp.dot(ws, m, preferred_element_type=jnp.float32)  # (P_HAT, 128)
            # 3. sublane select-reduce by ps
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (P_HAT, LANES), 0)
                == ps[r : r + 1, :]
            ).astype(jnp.float32)
            rows_out.append(jnp.sum(t * sel, axis=0, keepdims=True))
        acc = jnp.concatenate(rows_out, axis=0)
        out_ref[c] = acc

        # 4. RMW accumulate back (bwd pattern): dtab[pages[c, p]] += row p
        g = acc[:P_HAT] * 0.5
        for p in range(P_HAT):
            row = dtab_ref[pl.ds(pages_ref[c, p], 1), :]
            dtab_ref[pl.ds(pages_ref[c, p], 1), :] = row + g[p : p + 1, :]


def run_gather(pages, idx, table, chunk):
    n = pages.shape[0]
    grid = (n // chunk,)
    return pl.pallas_call(
        functools.partial(gather_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, P_HAT), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAGES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAGES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((PAGES, LANES), jnp.float32),
        ),
    )(pages, idx, table)


def taa_kernel(idx_ref, x_ref, out_ref, *, chunk, axis):
    for c in range(chunk):
        out_ref[c] = jnp.take_along_axis(x_ref[c], idx_ref[c], axis=axis)


def run_taa(idx, x, chunk, axis):
    n = x.shape[0]
    return pl.pallas_call(
        functools.partial(taa_kernel, chunk=chunk, axis=axis),
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, LANES), jnp.float32),
    )(idx, x)


def main():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(PAGES, LANES)).astype(np.float32)
    pages = rng.integers(0, PAGES, size=(N_TILES, P_HAT)).astype(np.int32)
    idx = rng.integers(0, P_HAT * LANES, size=(N_TILES, 8, LANES)).astype(np.int32)

    f = jax.jit(functools.partial(run_gather, chunk=8))
    out, dtab = f(pages, idx, table)
    out = np.asarray(out)

    # numpy oracle
    ws = table[pages]  # (N, P_HAT, 128)
    want = np.take_along_axis(
        ws.reshape(N_TILES, -1)[:, :, None].repeat(1, axis=2),
        idx.reshape(N_TILES, -1, 1),
        axis=1,
    ).reshape(N_TILES, 8, LANES)
    # simpler: want[n, r, k] = ws[n, ps, lane]
    ps = idx >> 7
    lane = idx & 127
    want = np.zeros_like(out)
    for r in range(8):
        want[:, r, :] = np.take_along_axis(
            ws.reshape(N_TILES, -1), (ps[:, r, :] * 128 + lane[:, r, :]), axis=1
        )
    err = np.abs(out - want).max()
    t = timeit(f, pages, idx, table)
    print(json.dumps({"name": "paged_gather_kernel", "max_err": float(err),
                      "ms": round(t * 1e3, 3),
                      "us_per_tile": round(t * 1e6 / N_TILES, 3)}), flush=True)

    x = rng.normal(size=(N_TILES, 8, LANES)).astype(np.float32)
    il = rng.integers(0, LANES, size=(N_TILES, 8, LANES)).astype(np.int32)
    try:
        f1 = jax.jit(functools.partial(run_taa, chunk=8, axis=2))
        o = np.asarray(f1(il, x))
        w = np.take_along_axis(x, il, axis=2)
        t = timeit(f1, il, x)
        print(json.dumps({"name": "taa_lane", "max_err": float(np.abs(o - w).max()),
                          "ms": round(t * 1e3, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"name": "taa_lane", "error": str(e)[:200]}), flush=True)

    isub = rng.integers(0, 8, size=(N_TILES, 8, LANES)).astype(np.int32)
    try:
        f2 = jax.jit(functools.partial(run_taa, chunk=8, axis=1))
        o = np.asarray(f2(isub, x))
        w = np.take_along_axis(x, isub, axis=1)
        t = timeit(f2, isub, x)
        print(json.dumps({"name": "taa_sublane", "max_err": float(np.abs(o - w).max()),
                          "ms": round(t * 1e3, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"name": "taa_sublane", "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    main()
