#!/usr/bin/env python
"""Fused-step cost measured CLEANLY: scene and every array passed as jit
arguments (captured jit constants measure ~ms of per-call staging through
the remote tunnel and poison the numbers — see tools/stack_bench.py
history)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.ops import traverse8 as t8
from cudapathtracer_tpu.ops.intersect import BIG_T, safe_inv_dir
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene

import os as _os
N = int(_os.environ.get("SB_N", "103680"))
REPS = int(_os.environ.get("SB_REPS", "10"))


def timeit(fn, *args):
    # fn must return ONE small array/scalar; float() readback is the only
    # trustworthy barrier through the axon tunnel (docs/ROADMAP.md), and a
    # scalar keeps the per-rep transfer negligible
    out = fn(*args)
    base = float(jnp.asarray(out).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        _ = float(jnp.asarray(out).astype(jnp.float32).sum()) - base
    return (time.perf_counter() - t0) / REPS


def main():
    print("device:", jax.devices()[0], " N =", N)
    scene, _ = build_scene(builtin.cornell_with_bunny(6), builtin_materials())
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((N, 3)) + jnp.array([0.0, 0.0, 1.0])
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    inv_d = safe_inv_dir(d)
    skip = jnp.full((N,), -1, jnp.int32)
    is_shadow = jnp.zeros((N,), bool)
    ts0 = t8.trav_start(t8.trav_idle(N), jnp.ones((N,), bool),
                        jnp.full((N,), BIG_T))

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_steps(scene, ts, o, d, inv_d, skip, is_shadow, n):
        fstep = t8.make_fused_step(scene)
        for _ in range(n):
            ts = fstep(ts, o, d, inv_d, skip, is_shadow)
        # scalar summary over every register so nothing is DCE'd
        return (ts.t_cut.sum() + ts.tri.sum() + ts.top.sum()
                + ts.flag.sum() + ts.stack.sum() + ts.scale.sum()
                + ts.u.sum() + ts.v.sum() + ts.direct.sum()
                + ts.lostc.sum())

    base = None
    for n in (1, 4, 12, 24):
        dt = timeit(run_steps, scene, ts0, o, d, inv_d, skip, is_shadow, n)
        print(f"steps x{n:2d}: {dt*1e6:9.1f} us/call  "
              f"{dt/n*1e6:8.1f} us/step  {dt/n/N*1e9:5.2f} ns/lane")
        if n == 24:
            base = dt

    # while_loop wrapper (the real execution shape inside the mega loop)
    @functools.partial(jax.jit, static_argnames=("spi",))
    def run_while(scene, ts, o, d, inv_d, skip, is_shadow, iters, spi):
        fstep = t8.make_fused_step(scene)

        def body(c):
            i, ts = c
            for _ in range(spi):
                ts = fstep(ts, o, d, inv_d, skip, is_shadow)
            return i + 1, ts

        _, ts = jax.lax.while_loop(lambda c: c[0] < iters, body, (0, ts))
        return (ts.t_cut.sum() + ts.tri.sum() + ts.top.sum()
                + ts.flag.sum() + ts.stack.sum() + ts.scale.sum()
                + ts.u.sum() + ts.v.sum() + ts.direct.sum()
                + ts.lostc.sum())

    for spi, iters in ((12, 8), (12, 64), (12, 128)):
        dt = timeit(run_while, scene, ts0, o, d, inv_d, skip, is_shadow,
                    jnp.int32(iters), spi)
        tot = spi * iters
        print(f"while spi={spi} iters={iters}: {dt*1e6:9.1f} us/call  "
              f"{dt/tot*1e6:8.1f} us/step  {dt/tot/N*1e9:5.2f} ns/lane")


if __name__ == "__main__":
    main()
