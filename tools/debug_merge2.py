#!/usr/bin/env python
"""Stage-2 decomposition of the SPPM deficit: direct lighting only.

At the first eye hit of each pixel:
  A. direct-lighting truth via dense area-light MC (NEE-style, no BSDF
     sampling) — the analytic target
  B. photon-merge estimate restricted to DEPTH-1 photons (photons that
     flew straight from the light to their first surface)
  C. flux audit: sum of depth-1 photon betas / N vs Le*pi*A_total
If B/A << 1 while C checks out, the deposit geometry/f eval is wrong;
if C is off, the emission seed is wrong.

Usage: JAX_PLATFORMS=cpu python tools/debug_merge2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cudapathtracer_tpu.models import paths
    from cudapathtracer_tpu.ops import bsdf as bsdf_ops
    from cudapathtracer_tpu.ops import traverse
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.utils import rng
    from cudapathtracer_tpu.utils.math import (PI, RAY_EPSILON, dot,
                                               length_sq, normalize,
                                               to_local)

    size = 32
    spp = 256          # photon-side averaging
    r = 0.05           # fixed fat merge radius for statistics
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), size, size, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(size), jnp.arange(size))
    px, py = px.ravel(), py.ravel()
    n = px.shape[0]
    key = rng.base_key()
    pid = rng.pixel_ids(px, py)
    ones = jnp.ones((n,), jnp.float32)

    # fixed eye geometry (one jittered primary per pixel, same every pass)
    ekey = jax.random.fold_in(rng.sample_key(key, 0), 2)
    estart, _ = paths.start_eye_walk(scene, cam, ekey, px, py, ids=pid)
    hit = traverse.closest_hit(scene, estart.o, estart.d)
    info = traverse.interpolate_hit(scene, estart.o, estart.d, hit)
    normal, pos = info["normal"], info["point"]
    mat = scene.materials.gather(info["mat_id"])
    albedo = bsdf_ops.resolve_albedo(scene, mat, info["uv"])
    trans = bsdf_ops.resolve_transmission(scene, mat, info["uv"])
    conn = np.asarray(hit.valid & ~mat.is_specular)
    eye_prev_loc = to_local(normalize(estart.prev_pt - pos), normal)

    num = max(scene.num_lights, 1)

    # ---- A. direct truth by area-light MC
    @jax.jit
    def direct_once(k):
        ul = jax.random.uniform(k, (n,))
        li = jnp.minimum((ul * num).astype(jnp.int32), num - 1)
        a, b, c = (scene.light_p0[li], scene.light_p1[li],
                   scene.light_p2[li])
        u = jnp.sqrt(jax.random.uniform(jax.random.fold_in(k, 1), (n,)))
        v = jax.random.uniform(jax.random.fold_in(k, 2), (n,))
        w0, w1, w2 = (1.0 - u), u * (1.0 - v), u * v
        lp = w0[:, None] * a + w1[:, None] * b + w2[:, None] * c
        tri = scene.light_tri[li]
        n3 = scene.tri_n[tri]
        lnrm = normalize(w0[:, None] * n3[:, 0] + w1[:, None] * n3[:, 1]
                         + w2[:, None] * n3[:, 2])
        area = scene.light_area[li]
        le = scene.light_emission[li]
        tol = lp - pos
        d2 = jnp.maximum(length_sq(tol), 1e-12)
        dist = jnp.sqrt(d2)
        tolu = tol / dist[:, None]
        cos_x = jnp.abs(dot(normal, tolu))
        cos_l = jnp.maximum(dot(lnrm, -tolu), 0.0)
        sh = traverse.shadow_factor(scene, pos + normal * RAY_EPSILON,
                                    tolu, dist - 2 * RAY_EPSILON)
        vis = jnp.max(sh, axis=-1)
        stl_loc = to_local(tolu, normal)
        f = bsdf_ops.bsdf_f(mat, albedo, stl_loc, eye_prev_loc, ones,
                            transmission=trans)
        pdf = (1.0 / num) / jnp.maximum(area, 1e-20)
        return f * (le * (cos_x * cos_l / d2 * vis / pdf)[:, None])

    acc = np.zeros((n, 3), np.float64)
    S = 128
    for s in range(S):
        acc += np.asarray(direct_once(jax.random.fold_in(key, 500 + s)),
                          np.float64)
    direct = acc / S
    dmean = float(direct[conn].mean())
    print(f"A. direct truth mean (conn px) {dmean:.5f}")

    # ---- B. depth-1 photon merge with fat fixed radius
    @jax.jit
    def merge_once(sample_idx, depth_lo, depth_hi):
        skey = rng.sample_key(key, sample_idx)
        key_l = jax.random.fold_in(skey, 1)
        start, _ = paths.start_light_walk(scene, key_l, n, ids=pid)
        lbufs, _e, _r = paths.random_walk(
            scene, key_l, start, 7, 1, eta_vcm=1.0,
            first_vm_seed=jnp.zeros((n,)), ids=pid)
        drange = (jnp.arange(lbufs.valid.shape[0]) >= depth_lo) & \
                 (jnp.arange(lbufs.valid.shape[0]) < depth_hi)
        pmask = (lbufs.valid & ~lbufs.is_delta
                 & drange[:, None]).reshape(-1)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        p_pt, p_wi, p_beta = flat(lbufs.pt), flat(lbufs.wo), flat(lbufs.beta)

        merge_norm = 1.0 / (PI * r * r * n)
        colorsum = jnp.zeros((n, 3), jnp.float32)
        count = jnp.zeros((n,), jnp.int32)
        C = 512
        for c0 in range(0, p_pt.shape[0], C):
            cp, cw = p_pt[c0:c0 + C], p_wi[c0:c0 + C]
            cb, cm = p_beta[c0:c0 + C], pmask[c0:c0 + C]
            d2 = jnp.sum((pos[None] - cp[:, None]) ** 2, axis=-1)
            in_r = cm[:, None] & (d2 <= r * r)
            wi_loc = to_local(jnp.broadcast_to(cw[:, None], (C, n, 3)),
                              jnp.broadcast_to(normal[None], (C, n, 3)))
            f_val = bsdf_ops.bsdf_f(
                mat, albedo, wi_loc,
                jnp.broadcast_to(eye_prev_loc[None], (C, n, 3)),
                ones, transmission=trans)
            contrib = cb[:, None] * f_val * merge_norm
            colorsum = colorsum + jnp.sum(
                jnp.where(in_r[:, :, None], contrib, 0.0), axis=0)
            count = count + jnp.sum(in_r, axis=0)
        # flux audit for the same mask
        flux = jnp.sum(jnp.where(pmask[:, None], p_beta, 0.0), axis=0) / n
        return colorsum, count, flux

    for lo, hi, tag in ((0, 1, "depth1"), (1, 6, "depth2+"), (0, 6, "all")):
        acc = np.zeros((n, 3), np.float64)
        cnt = 0.0
        fl = np.zeros((3,), np.float64)
        for s in range(spp):
            cs, ct, fx = merge_once(s, lo, hi)
            acc += np.asarray(cs, np.float64)
            cnt += float(np.asarray(ct, np.float64)[conn].mean())
            fl += np.asarray(fx, np.float64)
        est = acc / spp
        emean = float(est[conn].mean())
        print(f"B[{tag}] merge mean {emean:.5f} "
              f"(photons/query {cnt/spp:.2f}, flux/path {fl/spp})")
        if tag == "depth1":
            print(f"   depth1 ratio vs direct truth: {emean/dmean:.4f}")

    le = np.asarray(scene.light_emission)
    ar = np.asarray(scene.light_area)
    print(f"C. Le*pi*A_total = {np.sum(le * ar[:, None], axis=0) * np.pi}"
          f" (num={num})")


if __name__ == "__main__":
    main()
