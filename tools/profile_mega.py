#!/usr/bin/env python
"""Decompose the mega-wavefront integrator's time on real hardware.

Measures, on the current jax default device:
  1. raw gather throughput table[idx] for several row widths / lane counts;
  2. the fused traversal node-step cost (no transition);
  3. one full mega iteration (steps_per_iter node-steps + transition) so the
     transition cost falls out by subtraction;
  4. end-to-end render_sample with debug counters (iterations, fires) to
     derive the lane-idle fraction.

Usage: python tools/profile_mega.py [--width 103680] [--steps 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_gathers(width):
    """Chained gathers (16 per dispatch, each idx depends on the previous
    result) — defeats overlap and amortizes the tunnel dispatch floor."""
    print("== raw gather: table[idx], 16 chained ==")
    key = jax.random.PRNGKey(0)
    CH = 16
    for rows in (1 << 15,):
        for cols in (16, 32, 64, 128, 256):
            table = jax.random.normal(key, (rows, cols), jnp.float32)
            idx = jax.random.randint(key, (width,), 0, rows)

            @jax.jit
            def g(t, i):
                for _ in range(CH):
                    row = t[i]
                    i = (i + row[:, 0].astype(jnp.int32) % 7 + 1) % rows
                return i
            dt = timeit(g, table, idx) / CH
            print(f"rows={rows} cols={cols:4d} width={width}: "
                  f"{dt*1e6:8.1f} us/gather  {dt/width*1e9:6.2f} ns/lane  "
                  f"{width*cols*4/dt/1e9:6.1f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=103680)
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()
    w = args.width

    print("device:", jax.devices()[0])
    bench_gathers(w)

    from cudapathtracer_tpu.models import unidirectional_mega as mega
    from cudapathtracer_tpu.ops.intersect import BIG_T, safe_inv_dir
    from cudapathtracer_tpu.ops.traverse8 import (make_fused_step, trav_idle,
                                                  trav_start)
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.utils import rng

    mesh = builtin.cornell_with_bunny(subdivisions=6)
    scene, _ = build_scene(mesh, builtin_materials())
    print(f"scene: {mesh.num_triangles} tris, bvh8_table "
          f"{scene.bvh8_table.shape} "
          f"({np.prod(scene.bvh8_table.shape)*4/1e6:.1f} MB)")
    W, H = 1920, 1080
    cam = Camera.pinhole((0.0, 0.0, 1.0), W, H, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(H))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()

    # --- 2. pure fused step cost ------------------------------------------
    fstep = make_fused_step(scene)
    k2 = jax.random.PRNGKey(1)
    o = jnp.zeros((w, 3), jnp.float32) + jnp.array([0.0, 0.0, 1.0])
    d = jax.random.normal(k2, (w, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    inv_d = safe_inv_dir(d)
    skip = jnp.full((w,), -1, jnp.int32)
    is_shadow = jnp.zeros((w,), bool)
    ts0 = trav_start(trav_idle(w), jnp.ones((w,), bool),
                     jnp.full((w,), BIG_T, jnp.float32))

    def make_run(n_static):
        @jax.jit
        def run_steps(ts):
            for _ in range(n_static):
                ts = fstep(ts, o, d, inv_d, skip, is_shadow)
            return ts
        return run_steps

    for n in (1, 4, 12):
        f = make_run(n)
        dtm = timeit(f, ts0, reps=10)
        print(f"fused step x{n:2d} width={w}: {dtm*1e6:8.1f} us total, "
              f"{dtm/n*1e6:7.1f} us/step, {dtm/n/w*1e9:5.2f} ns/lane/step")

    # --- 4. end-to-end with counters --------------------------------------
    for spi, ms in ((12, 3), (12, 1), (24, 6), (6, 2)):
        t0 = time.perf_counter()
        acc, rays, it, fires, busy = mega.render_sample(
            scene, cam, key, 0, px, py, max_depth=8, width=w,
            steps_per_iter=spi, mini_splits=ms, debug_counters=True)
        jax.block_until_ready(acc)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc, rays, it, fires, busy = mega.render_sample(
            scene, cam, key, 1, px, py, max_depth=8, width=w,
            steps_per_iter=spi, mini_splits=ms, debug_counters=True)
        jax.block_until_ready(acc)
        dtr = time.perf_counter() - t0
        rays_i, it_i = int(rays), int(it)
        steps = it_i * spi
        mrays = rays_i / dtr / 1e6
        # useful rows/ray proxy: total lane-steps / rays
        print(f"spi={spi} mini={ms}: {dtr:6.2f}s  rays={rays_i/1e6:6.1f}M  "
              f"{mrays:5.2f} Mrays/s  iters={it_i}  "
              f"lane-steps/ray={steps*w/max(rays_i,1):6.1f}  "
              f"busy={int(busy)/max(steps*w,1):5.1%}  "
              f"us/iter={dtr/it_i*1e6:8.1f}  (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
