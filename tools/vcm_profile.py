#!/usr/bin/env python
"""Attribute the reference-shipped VCM workload's sample time (BASELINE
config6: 800x800, eye 16 / light 10) to its stages by toggling VCMConfig
features and differencing end-to-end times: full, no-merge (skips photon
grid build + merge loop), no-light-trace (skips the splat), eye-only, and
a light-pass-only run (eye machine with depth 1).

Usage: python tools/vcm_profile.py [--size 800] [--spp 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    ap.add_argument("--spp", type=int, default=2)
    args = ap.parse_args()

    scene, _ = build_scene(builtin.cornell_with_blocks(),
                           builtin_materials())
    n = args.size
    cam = Camera.pinhole((0.0, 0.0, 1.0), n, n, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(n), jnp.arange(n))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()

    variants = {
        "full": vcm.VCMConfig(eye_depth=16, light_depth=10),
        "no_merge": vcm.VCMConfig(eye_depth=16, light_depth=10,
                                  do_merge=False),
        "no_lighttrace": vcm.VCMConfig(eye_depth=16, light_depth=10,
                                       light_trace=False),
        "no_connect": vcm.VCMConfig(eye_depth=16, light_depth=10,
                                    connection=False),
        "eye_only": vcm.VCMConfig(eye_depth=16, light_depth=10,
                                  do_merge=False, light_trace=False,
                                  connection=False),
        "light1": vcm.VCMConfig(eye_depth=1, light_depth=10),
    }
    for name, cfg in variants.items():
        out = vcm_mega.render_sample(scene, cam, key, 0, px, py, cfg=cfg,
                                     grid_w=n)
        _ = float(out[0].sum())
        t0 = time.perf_counter()
        acc, rays = vcm_mega.render_sample(scene, cam, key, 1, px, py,
                                           cfg=cfg, grid_w=n)
        _ = float(acc.sum())
        dt = time.perf_counter() - t0
        print(f"{name:>14}: {dt:7.2f}s  rays={int(rays)/1e6:7.2f}M  "
              f"{int(rays)/dt/1e6:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
