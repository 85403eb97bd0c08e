#!/usr/bin/env python
"""Stage-3: is unweighted merge unbiased at PRODUCTION radius, and what is
the SPPM-comparable truth (uni minus directly-visible emission)?

Also instruments the production merge MIS weights: average weight carried
by merge events vs the partition-model share.

Usage: JAX_PLATFORMS=cpu python tools/debug_merge3.py [size] [spp]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cudapathtracer_tpu.models import paths, unidirectional, vcm
    from cudapathtracer_tpu.ops import bsdf as bsdf_ops
    from cudapathtracer_tpu.ops import traverse
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.utils import rng

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), size, size, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(size), jnp.arange(size))
    px, py = px.ravel(), py.ravel()
    n = px.shape[0]
    key = rng.base_key()
    rkey = rng.base_key(7)

    # uni reference and the emission seen at the first hit
    acc = np.zeros((n, 3), np.float64)
    em = np.zeros((n, 3), np.float64)
    for s in range(64):
        li, _ = unidirectional.render_sample(scene, cam, rkey, s, px, py,
                                             max_depth=8)
        acc += np.asarray(li, np.float64)
        ekey = jax.random.fold_in(rng.sample_key(rkey, s), 2)
        estart, _ = paths.start_eye_walk(scene, cam, ekey, px, py,
                                         ids=rng.pixel_ids(px, py))
        hit = traverse.closest_hit(scene, estart.o, estart.d)
        info = traverse.interpolate_hit(scene, estart.o, estart.d, hit)
        is_l = np.asarray(hit.valid & (info["light_ind"] >= 0)
                          & ~info["backface"])
        le = np.asarray(
            scene.light_emission[jnp.maximum(info["light_ind"], 0)])
        em += np.where(is_l[:, None], le, 0.0)
    ref = acc / 64
    emdir = em / 64
    print(f"uni mean {ref.mean():.5f}; visible emission {emdir.mean():.5f}; "
          f"uni-minus-emission {ref.mean()-emdir.mean():.5f} "
          f"(SPPM-comparable truth ratio "
          f"{(ref.mean()-emdir.mean())/ref.mean():.4f})")

    # production-schedule unweighted SPPM
    scfg = vcm.VCMConfig(eye_depth=8, light_depth=6, light_trace=False,
                         nee=False, naive=False, connection=False,
                         do_mis=False, do_sppm=True)
    acc = np.zeros((n, 3), np.float64)
    for s in range(spp):
        li, _ = vcm.render_sample(scene, cam, key, s, px, py, cfg=scfg)
        acc += np.asarray(li, np.float64)
    sppm = acc / spp
    print(f"sppm(prod radius) mean {sppm.mean():.5f} "
          f"ratio-vs-(uni-em) {sppm.mean()/(ref.mean()-emdir.mean()):.4f}")

    # full-transport SPPM truth also excludes paths the light_depth=6 walk
    # can't make; estimate that loss with light_depth=12
    scfg12 = vcm.VCMConfig(eye_depth=8, light_depth=12, light_trace=False,
                           nee=False, naive=False, connection=False,
                           do_mis=False, do_sppm=True)
    acc = np.zeros((n, 3), np.float64)
    for s in range(spp):
        li, _ = vcm.render_sample(scene, cam, key, s, px, py, cfg=scfg12)
        acc += np.asarray(li, np.float64)
    sppm12 = acc / spp
    print(f"sppm(light_depth=12) mean {sppm12.mean():.5f} "
          f"ratio-vs-(uni-em) {sppm12.mean()/(ref.mean()-emdir.mean()):.4f}")


if __name__ == "__main__":
    main()
