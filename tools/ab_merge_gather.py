#!/usr/bin/env python
"""Same-hour A/B for one VCM-mega config6 sample (800^2 eye16/light10).

Usage: python tools/ab_merge_gather.py [--size 800] [--samples 2]
Prints s/sample for the current TPT_GRID_BATCH_GATHER setting; run twice
with the env toggled for the A/B (separate processes — the flag is read
at trace time).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import jax.numpy as jnp

from cudapathtracer_tpu.models import vcm, vcm_mega
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--variant", default="full",
                    choices=["full", "no_merge", "no_connect",
                             "no_lighttrace"])
    args = ap.parse_args()

    scene, _ = build_scene(builtin.cornell_with_blocks(),
                           builtin_materials())
    n = args.size
    cam = Camera.pinhole((0.0, 0.0, 1.0), n, n, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(n), jnp.arange(n))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    kw = {"no_merge": {"do_merge": False},
          "no_connect": {"connection": False},
          "no_lighttrace": {"light_trace": False}}.get(args.variant, {})
    cfg = vcm.VCMConfig(eye_depth=16, light_depth=10, **kw)

    flag = (args.variant + " "
            + os.environ.get("TPT_GRID_BATCH_GATHER", "1"))
    out = vcm_mega.render_sample(scene, cam, key, 0, px, py, cfg=cfg,
                                 grid_w=n)
    _ = float(out[0].sum())
    times = []
    for s in range(1, args.samples + 1):
        t0 = time.perf_counter()
        acc, rays = vcm_mega.render_sample(scene, cam, key, s, px, py,
                                           cfg=cfg, grid_w=n)
        _ = float(acc.sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"batch_gather={flag}: best {best:6.2f} s/sample "
          f"(all: {['%.2f' % t for t in times]}) "
          f"{int(rays)/best/1e6:5.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
