#!/usr/bin/env python
"""Sweep mega-wavefront schedule knobs (steps_per_iter, mini_splits, width)
on the 1080p headline scene."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))  # warm-compile reruns (see bench.py note)

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.models import unidirectional_mega as mega
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng


def main():
    scene, _ = build_scene(builtin.cornell_with_bunny(6), builtin_materials())
    W, H = 1920, 1080
    cam = Camera.pinhole((0.0, 0.0, 1.0), W, H, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(H))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    cfgs = [(24, 6, 103680), (48, 12, 103680), (24, 6, 207360),
            (48, 12, 207360), (96, 24, 103680), (24, 6, 414720)]
    if len(sys.argv) > 1:
        cfgs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    for spi, ms, w in cfgs:
        t0 = time.perf_counter()
        acc, rays, it, fires, busy = mega.render_sample(
            scene, cam, key, 0, px, py, max_depth=8, width=w, grid_w=W,
            steps_per_iter=spi, mini_splits=ms, debug_counters=True)
        _ = float(acc.sum())  # true readback barrier — block_until_ready
        # on a remote axon array has returned early (bogus ~0 s timings)
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc, rays, it, fires, busy = mega.render_sample(
            scene, cam, key, 1, px, py, max_depth=8, width=w, grid_w=W,
            steps_per_iter=spi, mini_splits=ms, debug_counters=True)
        _ = float(acc.sum())
        dt = time.perf_counter() - t0
        rays_i, it_i, busy_i = int(rays), int(it), int(busy)
        steps = it_i * max(1, spi // max(1, min(ms, spi))) * max(
            1, min(ms, spi))
        print(f"spi={spi:3d} mini={ms:2d} w={w}: {dt:6.2f}s  "
              f"{rays_i/dt/1e6:5.2f} Mrays/s  iters={it_i}  "
              f"lane-steps/ray={steps*w/max(rays_i,1):6.1f}  "
              f"busy={busy_i/max(steps*w,1):5.1%}  "
              f"us/iter={dt/it_i*1e6:8.0f}  (compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
