#!/usr/bin/env python
"""Isolated stack-discipline microbench: shift-based (current) vs
top-pointer/one-hot, at several depths. Synthetic data-independent masks so
nothing couples to traversal behavior."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 103680
CH = 8
REPS = 10


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
    want = jax.random.randint(key, (N,), 0, 2) > 0
    count0 = jax.random.randint(key, (N,), 0, 8)
    deferred = [jax.random.randint(key, (N,), 0, 1000) for _ in range(7)]

    for D in (28, 16, 12):
        stack = jnp.zeros((D, N), jnp.int32)
        top = jnp.zeros((N,), jnp.int32)

        @jax.jit
        def shift_pp(s, t, cnt):
            for k in range(CH):
                # pop
                has = want & (t > 0)
                entry = jnp.where(has, s[0], -1)
                sh = jnp.concatenate([s[1:], s[:1]], axis=0)
                s = jnp.where(has[None, :], sh, s)
                t = jnp.where(has, t - 1, t)
                # push block
                for bit in (4, 2, 1):
                    m = (cnt & bit) != 0
                    sh = jnp.concatenate([s[:bit], s[:-bit]], axis=0)
                    s = jnp.where(m[None, :], sh, s)
                head = [jnp.where(i < cnt, deferred[i], s[i])
                        for i in range(7)]
                s = jnp.concatenate([jnp.stack(head, 0), s[7:]], axis=0)
                t = jnp.minimum(t + cnt, D)
                cnt = (cnt + entry) % 8
            return s, t
        dt = timeit(shift_pp, stack, top, count0)
        print(f"shift   D={D:2d}: {dt*1e6:8.1f} us  {dt/N*1e9:5.2f} ns/lane")

        rows = jnp.arange(D, dtype=jnp.int32)[:, None]

        @jax.jit
        def onehot_pp(s, t, cnt):
            for k in range(CH):
                # pop: read row t-1 via one-hot reduce
                has = want & (t > 0)
                sel = rows == (t - 1)[None, :]
                entry = jnp.where(has, jnp.sum(jnp.where(sel, s, 0), axis=0),
                                  -1)
                t = jnp.where(has, t - 1, t)
                # push cnt entries at rows t..t+cnt-1 via one-hot writes
                off = rows - t[None, :]
                newv = jnp.zeros_like(s)
                for i in range(7):
                    newv = jnp.where(off == i, deferred[i], newv)
                wr = (off >= 0) & (off < cnt[None, :])
                s = jnp.where(wr, newv, s)
                t = jnp.minimum(t + cnt, D)
                cnt = (cnt + entry) % 8
            return s, t
        dt = timeit(onehot_pp, stack, top, count0)
        print(f"one-hot D={D:2d}: {dt*1e6:8.1f} us  {dt/N*1e9:5.2f} ns/lane")


if __name__ == "__main__":
    main()
