#!/usr/bin/env python
"""Transition-cost attribution for the LANE-MAJOR mega engine by
monkey-patching ops/lanemajor blocks to stubs before tracing (results are
WRONG images — compare us/iter only).

Usage: python tools/mega_ablate.py [baseline|no_medium|no_nee|flat_shade|
                                    no_raygen|no_rng] ...
Runs each mode in-process sequentially (fresh trace per mode because the
patch set differs -> different jit cache keys via closure identity: we
re-import nothing, so pass width/schedule explicitly and rely on
render_sample retracing when the patched functions change behavior is NOT
guaranteed — run ONE mode per process for trustworthy numbers).
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

from cudapathtracer_tpu.ops import lanemajor as lm
from cudapathtracer_tpu.utils import rng as rng_mod

if mode == "no_medium":
    lm.dominant_mediumT = lambda ms: (jnp.zeros_like(ms.top),
                                      jnp.zeros_like(ms.top))
    lm.second_lowest_mediumT = lambda ms, mid: jnp.zeros_like(mid)
    lm.stack_pushT = lambda ms, mid, pri, mask: ms
    lm.stack_removeT = lambda ms, mid, mask: ms
elif mode == "no_nee":
    _orig_nee = lm.nee_sampleT

    def _nee_off(scene, key, draw_base, point, normal, wi_local, mat,
                 albedo, eta_i, active, ids=None, transmission=None,
                 lobe_mask=lm.ALL_LOBES):
        n = point.shape[1]
        z = jnp.zeros((3, n), jnp.float32)
        return lm.NEESampleT(z, jnp.full((n,), -1.0), z, point, z,
                             jnp.zeros((n,), jnp.float32),
                             jnp.zeros((n,), bool))
    lm.nee_sampleT = _nee_off
elif mode == "flat_shade":
    _orig_sd = lm.shade_dataT

    def _flat(scene, o, d, hit):
        info, mat = _orig_sd(scene, o, d, hit)
        n = o.shape[1]
        up = jnp.concatenate([jnp.zeros((2, n)), jnp.ones((1, n))], axis=0)
        info2 = dict(info)
        info2["normal"] = up
        info2["normal_a"] = up
        return info2, mat
    # NOTE: this keeps the gather+decode; "flat" only cuts the frame math
    # downstream. For the full shade ablation use no_shade.
    lm.shade_dataT = _flat
elif mode == "no_shade":
    _orig_sd = lm.shade_dataT

    def _none(scene, o, d, hit):
        n = o.shape[1]
        z = jnp.zeros((3, n), jnp.float32)
        up = jnp.concatenate([jnp.zeros((2, n)), jnp.ones((1, n))], axis=0)
        info = dict(point=o + d * hit.t[None, :], normal=up, normal_a=up,
                    uv=jnp.zeros((2, n)), emission=z,
                    mat_id=jnp.zeros((n,), jnp.int32),
                    backface=jnp.zeros((n,), bool),
                    light_ind=jnp.full((n,), -1, jnp.int32),
                    area=jnp.ones((n,)))
        return info, lm.MatT(**{f: getattr(scene.materials, f)[
            jnp.zeros((n,), jnp.int32)].T if f in
            ("albedo", "eta", "k", "absorption") else
            getattr(scene.materials, f)[jnp.zeros((n,), jnp.int32)]
            for f in ("type", "albedo", "roughness", "eta", "k", "ior",
                      "transmission", "is_specular", "boundary",
                      "thin_walled", "absorption", "priority", "tex_start",
                      "tex_width", "tex_height", "trans_tex_start",
                      "trans_tex_width", "trans_tex_height")})
    lm.shade_dataT = _none
elif mode == "no_raygen":
    _orig_gen = lm.generate_raysT

    def _const(camera, key, px, py, ids=None):
        n = px.shape[0]
        o = jnp.zeros((3, n), jnp.float32)
        d = jnp.concatenate([jnp.zeros((2, n)),
                             -jnp.ones((1, n))], axis=0)
        return o, d
    lm.generate_raysT = _const
elif mode == "no_rng":
    rng_mod.uniform_id = lambda key, tag, ids: jnp.full(ids.shape, 0.5)
    _orig_any = rng_mod.uniform_any

    def _half(key, tag, n, ids=None):
        return jnp.full((n,), 0.5, jnp.float32)
    rng_mod.uniform_any = _half
elif mode == "no_retire":
    # stub the [K,3,W] retirement sweep: paths still die and lanes refill,
    # but radiance is dropped (image black) — isolates the one-hot
    # where-sweep over the K-slot accumulator
    os.environ["TPT_MEGA_ABLATE_RETIRE"] = "1"

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
    width = int(os.environ.get("TPT_ABLATE_WIDTH", "12960"))
    out = mega.render_sample(scene, cam, key, 0, px, py, max_depth=8,
                             width=width, debug_counters=True, grid_w=W)
    _ = float(out[0].sum())
    t0 = time.perf_counter()
    acc, rays, it, fires, busy = mega.render_sample(
        scene, cam, key, 1, px, py, max_depth=8, width=width,
        debug_counters=True, grid_w=W)
    _ = float(acc.sum())
    dt = time.perf_counter() - t0
    it_i = int(it)
    print(f"{mode:>10}: {dt:6.2f}s  iters={it_i}  "
          f"us/iter={dt/it_i*1e6:8.0f}  rays={int(rays)}  "
          f"busy={int(busy)}", flush=True)


if __name__ == "__main__":
    main()
