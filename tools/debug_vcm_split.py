#!/usr/bin/env python
"""Per-technique decomposition of production VCM via exact ablation.

The RNG streams are purpose-keyed, so disabling one technique flag leaves
every other draw identical; render(all) - render(all-minus-X) is EXACTLY
technique X's weighted contribution. Compare each against the uni
reference to see which technique under-delivers its MIS share.

Usage: JAX_PLATFORMS=cpu python tools/debug_vcm_split.py [size] [spp]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    from cudapathtracer_tpu.models import unidirectional, vcm
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.utils import rng

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), size, size, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(size), jnp.arange(size))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    rkey = rng.base_key(7)

    def render(cfg, k, n_spp):
        acc = np.zeros((size * size, 3), np.float64)
        for s in range(n_spp):
            li, _ = vcm.render_sample(scene, cam, k, s, px, py, cfg=cfg)
            acc += np.asarray(li, np.float64)
        return acc / n_spp

    acc = np.zeros((size * size, 3), np.float64)
    for s in range(32):
        li, _ = unidirectional.render_sample(scene, cam, rkey, s, px, py,
                                             max_depth=8)
        acc += np.asarray(li, np.float64)
    ref = acc / 32
    rm = float(ref.mean())
    print(f"uni ref mean {rm:.5f}")

    base = dict(eye_depth=8, light_depth=6)
    full = vcm.VCMConfig(**base)
    img_full = render(full, key, spp)
    print(f"full VCM ratio {float(img_full.mean())/rm:.4f}")

    for name, flag in (("naive", "naive"), ("nee", "nee"),
                       ("conn", "connection"), ("splat", "light_trace"),
                       ("merge", "do_merge")):
        cfg = vcm.VCMConfig(**base, **{flag: False})
        img = render(cfg, key, spp)
        d = img_full - img
        print(f"  {name:<6} contribution mean {float(d.mean()):.5f} "
              f"({float(d.mean())/rm*100:.1f}% of ref)  "
              f"[w/o it: ratio {float(img.mean())/rm:.4f}]")

    # BDPT-mode comparison (merge off => eta=0 chains? no: VCMConfig
    # do_merge=False still passes eta_vcm into the recursion; true BDPT
    # reference point:
    from cudapathtracer_tpu.models import bdpt
    bcfg = bdpt.BDPTConfig(eye_depth=8, light_depth=6)
    acc = np.zeros((size * size, 3), np.float64)
    for s in range(spp):
        li, _ = bdpt.render_sample(scene, cam, key, s, px, py, cfg=bcfg)
        acc += np.asarray(li, np.float64)
    print(f"bdpt ratio {float(acc.mean()/spp)/rm:.4f}")


if __name__ == "__main__":
    main()
