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
                    help="256x256 quick mode (CI/CPU)")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--chunks", type=int, default=20,
                    help="split the wavefront into pixel chunks (memory cap; "
                    "~100k-lane chunks measured fastest on v5e)")
    ap.add_argument("--classic", action="store_true",
                    help="classic per-bounce wavefront integrator instead "
                    "of the default persistent mega-wavefront")
    ap.add_argument("--mega", action="store_true", help="(default)")
    ap.add_argument("--width", type=int, default=103680,
                    help="mega wavefront lane count (v5e sweet spot)")
    args = ap.parse_args()

    # pay the remote-tunnel first-transfer initialization outside the timers
    _ = float(jnp.zeros((8,)).sum())

    from cudapathtracer_tpu.models import unidirectional
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.utils import rng

    if args.small:
        w, h, subdiv = 256, 256, 4
    else:
        w, h, subdiv = 1920, 1080, 6  # ~82k tris, BASELINE configs 3

    t0 = time.perf_counter()
    mesh = builtin.cornell_with_bunny(subdivisions=subdiv)
    scene, _ = build_scene(mesh, builtin_materials())
    t_scene = time.perf_counter() - t0

    cam = Camera.pinhole((0.0, 0.0, 1.0), w, h, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px, py = px.ravel(), py.ravel()
    nchunks = max(args.chunks, 1) if not args.small else 1
    csz = px.shape[0] // nchunks
    pxc = [px[i * csz:(i + 1) * csz] for i in range(nchunks)]
    pyc = [py[i * csz:(i + 1) * csz] for i in range(nchunks)]
    key = rng.base_key()

    if not args.classic:
        from cudapathtracer_tpu.models import unidirectional_mega
        nchunks = 1
        pxc, pyc = [px], [py]
        csz = px.shape[0]

        def step(s, c):
            return unidirectional_mega.render_sample(
                scene, cam, key, s, px, py, max_depth=8,
                width=min(args.width, int(px.shape[0])))
    else:
        def step(s, c):
            return unidirectional.render_sample(scene, cam, key, s, pxc[c],
                                                pyc[c], max_depth=8)

    # warmup/compile; the device fetch forces real completion (the axon
    # tunnel's block_until_ready does not synchronize execution)
    li, rays = step(0, 0)
    _ = float(li.sum())

    accs = [jnp.zeros((csz, 3), jnp.float32) for _ in range(nchunks)]
    rtot = jnp.zeros((), jnp.int32)
    t0 = time.perf_counter()
    for s in range(args.warmup, args.warmup + args.spp):
        for c in range(nchunks):
            li, rays = step(s, c)
            accs[c] = accs[c] + li
            rtot = rtot + rays
            # bounded in-flight queue: the axon tunnel deadlocks when tens
            # of big dispatches are queued asynchronously (observed, round
            # 1); one cheap scalar fetch per chunk keeps it to ~1 in flight
            # at ~2% cost
            _ = float(rays)
    img = np.concatenate([np.asarray(a) for a in accs])  # the real barrier
    dt = time.perf_counter() - t0
    total_rays = int(rtot)

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
