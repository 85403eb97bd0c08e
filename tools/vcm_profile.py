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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))  # warm-compile reruns (see bench.py note)

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

    # direct grid-build probe: the argsort + boundary scatters at the
    # workload's true photon count (c_pix * (light_depth+1) rows)
    import jax

    from cudapathtracer_tpu.ops import hashgrid
    p_rows = n * n * 11
    key_p = jax.random.PRNGKey(0)
    rows = jax.random.uniform(key_p, (p_rows, 8), jnp.float32)
    valid = jax.random.uniform(key_p, (p_rows,)) < 0.4
    table = hashgrid.photon_table_size(p_rows)
    bg = jax.jit(lambda r, v: hashgrid.build_grid(
        r, v, jnp.zeros((3,)), 0.01, table))
    g = bg(rows, valid)
    _ = float(g.rows.sum())
    t0 = time.perf_counter()
    g = bg(rows, valid)
    _ = float(g.rows.sum())
    print(f"    build_grid: {time.perf_counter()-t0:7.2f}s  "
          f"({p_rows/1e6:.1f}M rows, table {table/1e6:.1f}M)", flush=True)

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
