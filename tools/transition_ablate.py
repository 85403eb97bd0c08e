#!/usr/bin/env python
"""Transition-cost attribution by monkey-patching blocks to cheap stubs
before tracing (results are WRONG images — timing only).

Usage: python tools/transition_ablate.py [baseline|no_medium|cosine_bsdf|flat_shade]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))  # warm-compile reruns (see bench.py note)

import jax
import jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "baseline"

from cudapathtracer_tpu.models import common
from cudapathtracer_tpu.ops import bsdf as bsdf_ops
from cudapathtracer_tpu.ops import traverse
from cudapathtracer_tpu.utils import rng as rng_mod

if mode == "no_medium":
    common.dominant_medium = lambda ms: (
        jnp.zeros_like(ms.top), jnp.zeros_like(ms.top))
    common.second_lowest_medium = lambda ms, mid: jnp.zeros_like(mid)
    common.stack_push = lambda ms, mid, pri, mask: ms
    common.stack_remove = lambda ms, mid, mask: ms
elif mode == "cosine_bsdf":
    _orig = bsdf_ops.bsdf_sample

    def cosine_only(key, tag, mat, albedo, wo_local, backface, eta_i,
                    transport_mode=0, ids=None, transmission=None):
        u1 = rng_mod.uniform_id(key, tag, ids)
        u2 = rng_mod.uniform_id(key, tag + 1, ids)
        r = jnp.sqrt(u1)
        phi = 2.0 * jnp.pi * u2
        z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        wo = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
        pdf = jnp.maximum(z / jnp.pi, 1e-3)
        return wo, albedo / jnp.pi, pdf
    bsdf_ops.bsdf_sample = cosine_only
elif mode == "flat_shade":
    _orig_sd = traverse.shade_data

    def flat_shade(scene, o, d, hit):
        n = o.shape[0]
        z = jnp.zeros((n, 3), jnp.float32)
        up = jnp.concatenate([z[:, :2], jnp.ones((n, 1))], axis=1)
        info = dict(point=o + d * hit.t[:, None], normal=up,
                    normal_a=up, uv=jnp.zeros((n, 2)), emission=z,
                    mat_id=jnp.zeros((n,), jnp.int32),
                    backface=jnp.zeros((n,), bool),
                    light_ind=jnp.full((n,), -1, jnp.int32),
                    area=jnp.ones((n,)),
                    )
        mat = scene.materials.gather(info["mat_id"])
        return info, mat
    traverse.shade_data = flat_shade

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
    dt = it = None
    for s in (0, 1):
        t0 = time.perf_counter()
        acc, rays, it, fires, busy = mega.render_sample(
            scene, cam, key, s, px, py, max_depth=8, width=103680,
            steps_per_iter=24, mini_splits=6, debug_counters=True)
        jax.block_until_ready(acc)
        dt = time.perf_counter() - t0
    print(f"{mode}: {dt:6.2f}s iters={int(it)} "
          f"us/iter={dt/int(it)*1e6:8.0f} rays={int(rays)/1e6:.1f}M")


if __name__ == "__main__":
    main()
