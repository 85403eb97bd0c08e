#!/usr/bin/env python
"""Benchmark harness: Mrays/s on the 1080p Cornell+bunny unidirectional
render (BASELINE.md headline metric). Prints ONE JSON line.

The reference publishes no numbers (BASELINE.md: "published": {}), so
vs_baseline is reported against this repo's self-imposed target of
TARGET_MRAYS on one chip — the driver records the absolute value per round.

Usage: python bench.py [--small] [--spp N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_MRAYS = 100.0  # self-imposed round-over-round target (no published ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="512x512 quick mode (CI/CPU)")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    from cudapathtracer_tpu.models import unidirectional
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.utils import rng

    if args.small:
        w, h, subdiv = 512, 512, 4
    else:
        w, h, subdiv = 1920, 1080, 6  # ~82k tris, BASELINE configs 3

    t0 = time.perf_counter()
    mesh = builtin.cornell_with_bunny(subdivisions=subdiv)
    scene, _ = build_scene(mesh, builtin_materials())
    t_scene = time.perf_counter() - t0

    cam = Camera.pinhole((0.0, 0.0, 1.0), w, h, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()

    def step(s):
        return unidirectional.render_sample(scene, cam, key, s, px, py,
                                            max_depth=8)

    # warmup/compile
    li, rays = step(0)
    li.block_until_ready()

    acc = jnp.zeros_like(li)
    total_rays = 0
    t0 = time.perf_counter()
    for s in range(args.warmup, args.warmup + args.spp):
        li, rays = step(s)
        acc = acc + li
        total_rays += int(rays)
    acc.block_until_ready()
    dt = time.perf_counter() - t0

    img = np.asarray(acc)
    assert np.isfinite(img).all(), "NaN/Inf in benchmark render"

    mrays = total_rays / dt / 1e6
    spp_s = args.spp / dt
    result = {
        "metric": f"Mrays/s unidirectional {w}x{h} Cornell+mesh({mesh.num_triangles} tris)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "spp_per_s": round(spp_s, 4),
        "rays": total_rays,
        "seconds": round(dt, 3),
        "scene_build_s": round(t_scene, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
