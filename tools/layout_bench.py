#!/usr/bin/env python
"""Test the lane-layout hypothesis: [N,k] arrays (k small) waste the
128-wide lane dim; [k,N] puts N on lanes. Times representative traversal
building blocks in both layouts."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 103680
REPS = 10
CH = 8  # chained iterations inside one jit


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS / CH


def main():
    print("device:", jax.devices()[0], " N =", N)
    key = jax.random.PRNGKey(0)

    # --- slab-test-like math: [N,3,8] vs [3,8,N] --------------------------
    b1 = jax.random.normal(key, (N, 6, 8))
    o1 = jax.random.normal(key, (N, 3))
    @jax.jit
    def slab_row_major(b, o):
        acc = jnp.zeros((N, 8))
        for _ in range(CH):
            t1 = (b[:, 0:3] - o[:, :, None]) * 1.7
            t2 = (b[:, 3:6] - o[:, :, None]) * 1.7
            tmin = jnp.max(jnp.minimum(t1, t2), axis=1)
            tmax = jnp.min(jnp.maximum(t1, t2), axis=1)
            acc = acc + jnp.where(tmax >= tmin, tmin, 0.0)
            o = o + acc[:, 0:3] * 1e-9
        return acc
    dt = timeit(slab_row_major, b1, o1)
    print(f"slab [N,6,8]: {dt*1e6:8.1f} us  {dt/N*1e9:5.2f} ns/lane")

    b2 = jnp.transpose(b1, (1, 2, 0))  # [6,8,N]
    o2 = o1.T  # [3,N]
    @jax.jit
    def slab_lane_major(b, o):
        acc = jnp.zeros((8, N))
        for _ in range(CH):
            t1 = (b[0:3] - o[:, None, :]) * 1.7
            t2 = (b[3:6] - o[:, None, :]) * 1.7
            tmin = jnp.max(jnp.minimum(t1, t2), axis=0)
            tmax = jnp.min(jnp.maximum(t1, t2), axis=0)
            acc = acc + jnp.where(tmax >= tmin, tmin, 0.0)
            o = o + acc[0:3] * 1e-9
        return acc
    dt = timeit(slab_lane_major, b2, o2)
    print(f"slab [6,8,N]: {dt*1e6:8.1f} us  {dt/N*1e9:5.2f} ns/lane")

    # --- stack shift: [N,28] vs [28,N] ------------------------------------
    s1 = jax.random.randint(key, (N, 28), 0, 1000)
    m1 = jax.random.randint(key, (N,), 0, 2) > 0
    @jax.jit
    def shift_row_major(s, m):
        for _ in range(CH):
            shifted = jnp.concatenate([s[:, 1:], s[:, :1]], axis=1)
            s = jnp.where(m[:, None], shifted, s)
            m = ~m
        return s
    dt = timeit(shift_row_major, s1, m1)
    print(f"stack shift [N,28]: {dt*1e6:8.1f} us  {dt/N*1e9:5.2f} ns/lane")

    s2 = s1.T
    @jax.jit
    def shift_lane_major(s, m):
        for _ in range(CH):
            shifted = jnp.concatenate([s[1:], s[:1]], axis=0)
            s = jnp.where(m[None, :], shifted, s)
            m = ~m
        return s
    dt = timeit(shift_lane_major, s2, m1)
    print(f"stack shift [28,N]: {dt*1e6:8.1f} us  {dt/N*1e9:5.2f} ns/lane")

    # --- gather + transpose: table[idx] -> [64,N] -------------------------
    table = jax.random.normal(key, (35594, 64))
    idx = jax.random.randint(key, (N,), 0, 35594)
    @jax.jit
    def gather_t(t, i):
        for _ in range(CH):
            row = t[i].T  # [64,N]
            i = (i + row[0].astype(jnp.int32) % 7 + 1) % 35594
            # consume ALL rows so nothing is DCE'd
            i = (i + (jnp.sum(row, axis=0) > 0)) % 35594
        return i
    dt = timeit(gather_t, table, idx)
    print(f"gather[N]->T [64,N] full use: {dt*1e6:8.1f} us  "
          f"{dt/N*1e9:5.2f} ns/lane")

    tableT = table.T  # [64, R]
    @jax.jit
    def gather_cols(t, i):
        for _ in range(CH):
            row = t[:, i]  # [64,N]
            i = (i + row[0].astype(jnp.int32) % 7 + 1) % 35594
            i = (i + (jnp.sum(row, axis=0) > 0)) % 35594
        return i
    dt = timeit(gather_cols, tableT, idx)
    print(f"gatherT[64,R][:,i] full use: {dt*1e6:8.1f} us  "
          f"{dt/N*1e9:5.2f} ns/lane")

    # row-major gather, full use, no transpose (baseline materialization)
    @jax.jit
    def gather_rm(t, i):
        for _ in range(CH):
            row = t[i]  # [N,64]
            i = (i + row[:, 0].astype(jnp.int32) % 7 + 1) % 35594
            i = (i + (jnp.sum(row, axis=1) > 0)) % 35594
        return i
    dt = timeit(gather_rm, table, idx)
    print(f"gather [N,64] full use:      {dt*1e6:8.1f} us  "
          f"{dt/N*1e9:5.2f} ns/lane")


if __name__ == "__main__":
    main()
