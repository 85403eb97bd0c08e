#!/usr/bin/env python
"""Nightly-style cross-integrator agreement harness (docs/ROADMAP.md item
11): render a battery of scenes — diffuse, specular, textured leaf
(alpha-cutout transmission map), nested dielectric, SDS glass core — with
every integrator at equal sample budget and report relative RMSE against
a high-spp reference rendered by the estimator best suited to the scene
(unidirectional for NEE-reachable scenes, VCM for SDS).

Emits one JSON line per (scene, integrator) so regressions in ANY
estimator/scene pairing are visible round over round:
  {"scene": ..., "integrator": ..., "rel_rmse": ..., "spp": ...}

Usage: python tools/nightly_rmse.py [--size 128] [--spp 64] [--ref-spp 512]
       [--scenes diffuse,specular,...] [--integrators uni,mega,...]

Consistency thresholds are NOT asserted here (it is a report, run it
nightly and diff); tests/test_integrators.py carries the hard gates.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def build_scenes(which):
    from cudapathtracer_tpu.scene import builtin, textures
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.utils.obj import MeshData

    out = {}
    if "diffuse" in which:
        out["diffuse"] = (build_scene(builtin.cornell_with_blocks(),
                                      builtin_materials())[0], "uni")
    if "specular" in which:
        out["specular"] = (build_scene(builtin.cornell_with_spheres(),
                                       builtin_materials())[0], "uni")
    if "leaf" in which:
        # cornell + a leaf-material quad (material 13: textured albedo +
        # transmission map -> exercises resolve_transmission at every
        # dispatch site, reflectors.cuh:573-578 parity)
        b = textures.AtlasBuilder()
        wins = [b.add_image(builtin.checker_texture(16).reshape(16, 16, 3))
                for _ in range(4)]
        mats = builtin_materials(wins)
        m = builtin.cornell_box()
        pts = np.asarray([[-0.6, -0.2, -0.2], [0.6, -0.2, -0.2],
                          [0.6, 0.6, -0.4], [-0.6, 0.6, -0.4]], np.float32)
        uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        m.add(pts, idx, 13, uvs=uvs, uv_idx=idx)
        out["leaf"] = (build_scene(m, mats, textures=b.build())[0], "uni")
    if "nested" in which:
        out["nested"] = (build_scene(builtin.cornell_pool(),
                                     builtin_materials())[0], "vcm")
    if "sds" in which:
        out["sds"] = (build_scene(builtin.cornell_glass_core(),
                                  builtin_materials())[0], "vcm")
    return out


def make_steps(size, width):
    from cudapathtracer_tpu.models import (bdpt, bdpt_mega, naive,
                                           unidirectional,
                                           unidirectional_mega, vcm,
                                           vcm_mega)

    bcfg = bdpt.BDPTConfig(eye_depth=8, light_depth=6)
    vcfg = vcm.VCMConfig(eye_depth=8, light_depth=6)
    scfg = vcm.VCMConfig(eye_depth=8, light_depth=6, light_trace=False,
                         nee=False, naive=False, connection=False,
                         do_mis=False, do_sppm=True)
    w = width

    return {
        "naive": lambda sc, c, k, s, px, py: naive.render_sample(
            sc, c, k, s, px, py, max_depth=8),
        "uni": lambda sc, c, k, s, px, py: unidirectional.render_sample(
            sc, c, k, s, px, py, max_depth=8),
        "mega": lambda sc, c, k, s, px, py: unidirectional_mega.render_sample(
            sc, c, k, s, px, py, max_depth=8,
            width=min(w, int(px.shape[0])), grid_w=size),
        "bdpt": lambda sc, c, k, s, px, py: bdpt.render_sample(
            sc, c, k, s, px, py, cfg=bcfg),
        "bdpt-mega": lambda sc, c, k, s, px, py: bdpt_mega.render_sample(
            sc, c, k, s, px, py, cfg=bcfg,
            width=min(w, int(px.shape[0])), grid_w=size),
        "vcm": lambda sc, c, k, s, px, py: vcm.render_sample(
            sc, c, k, s, px, py, cfg=vcfg),
        "vcm-mega": lambda sc, c, k, s, px, py: vcm_mega.render_sample(
            sc, c, k, s, px, py, cfg=vcfg,
            width=min(w, int(px.shape[0])), grid_w=size),
        "sppm": lambda sc, c, k, s, px, py: vcm.render_sample(
            sc, c, k, s, px, py, cfg=scfg),
    }


def render(step, scene, cam, key, px, py, spp):
    acc = np.zeros((px.shape[0], 3), np.float64)
    for s in range(spp):
        li, _ = step(scene, cam, key, s, px, py)
        acc += np.asarray(li, np.float64)
    return acc / spp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--ref-spp", type=int, default=512)
    ap.add_argument("--width", type=int, default=12960)
    ap.add_argument("--scenes", default="diffuse,specular,leaf,nested,sds")
    ap.add_argument("--integrators",
                    default="naive,uni,mega,bdpt,bdpt-mega,vcm,vcm-mega,sppm")
    args = ap.parse_args()

    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.utils import rng

    size = args.size
    cam = Camera.pinhole((0.0, 0.0, 1.0), size, size, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(size), jnp.arange(size))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    ref_key = rng.base_key(7)   # independent streams for the reference

    steps = make_steps(size, args.width)
    names = [n for n in args.integrators.split(",") if n in steps]
    scenes = build_scenes(args.scenes.split(","))

    for sname, (scene, refint) in scenes.items():
        t0 = time.perf_counter()
        ref = render(steps[refint], scene, cam, ref_key, px, py,
                     args.ref_spp)
        scale = float(np.mean(ref)) or 1.0
        print(json.dumps({"scene": sname, "reference": refint,
                          "ref_spp": args.ref_spp,
                          "ref_mean": round(scale, 6),
                          "seconds": round(time.perf_counter() - t0, 1)}),
              flush=True)
        for iname in names:
            t0 = time.perf_counter()
            img = render(steps[iname], scene, cam, key, px, py, args.spp)
            rel = float(np.sqrt(np.mean((img - ref) ** 2)) / scale)
            print(json.dumps({
                "scene": sname, "integrator": iname, "spp": args.spp,
                "rel_rmse": round(rel, 5),
                "mean_ratio": round(float(np.mean(img)) / scale, 5),
                "seconds": round(time.perf_counter() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
