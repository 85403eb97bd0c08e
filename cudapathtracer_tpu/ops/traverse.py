"""Stackless wavefront BVH traversal.

The TPU-first replacement for the reference's per-thread stack walk
(BVHSceneIntersect / BVHShadowRay, integratorUtilities.cuh:84-288). All rays
in the wavefront advance one BVH node per iteration of a single
`lax.while_loop`; per-lane state is one int32 node cursor driven by the
precomputed per-octant hit/miss links (scene/bvh.py), so there is no stack,
no divergence beyond masking, and every memory access is a batched row
gather (node bounds [N,6], links [N,2], triangle pack [N,9]) that XLA
vectorizes across lanes.

Near-child-first ordering comes from the octant-indexed links; the closest-
hit loop additionally prunes nodes with tmin >= t_best (the reference omits
this pruning — pure win, bitwise-identical results).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.ops.intersect import (BIG_T, aabb_intersect,
                                              moller_trumbore, safe_inv_dir)
from cudapathtracer_tpu.scene.materials import MAT_LEAF
from cudapathtracer_tpu.utils.math import dot, normalize


class Hit(NamedTuple):
    """Closest-hit record (pre-shading): all [N]."""
    t: jax.Array        # distance; == max_t on miss
    tri: jax.Array      # permuted triangle index, -1 on miss
    u: jax.Array        # barycentric weight of vertex b
    v: jax.Array        # barycentric weight of vertex c

    @property
    def valid(self):
        return self.tri >= 0


def _octant(d):
    o = (d[:, 0] < 0).astype(jnp.int32)
    o = o | ((d[:, 1] < 0).astype(jnp.int32) << 1)
    o = o | ((d[:, 2] < 0).astype(jnp.int32) << 2)
    return o


def closest_hit(scene, o, d, max_t=None, skip_tri=None, active=None) -> Hit:
    """Closest-hit traversal for a wavefront of rays.

    o, d: [N,3] (d normalized). max_t: scalar or [N]. skip_tri: [N] i32 or
    None (self-intersection exclusion). active: [N] bool lanes to trace.
    """
    n = o.shape[0]
    if max_t is None:
        max_t = jnp.full((n,), BIG_T, jnp.float32)
    else:
        max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (n,))
    if skip_tri is None:
        skip_tri = jnp.full((n,), -1, jnp.int32)
    inv_d = safe_inv_dir(d)
    oct8 = _octant(d)
    leaf_k = scene.max_leaf_size

    cur0 = jnp.zeros((n,), jnp.int32)
    if active is not None:
        cur0 = jnp.where(active, cur0, -1)

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        cur, t_best, tri, u, v = s
        live = cur >= 0
        curc = jnp.maximum(cur, 0)

        nb = scene.node_bounds[curc]                    # [N,6]
        tmin, tmax, hit = aabb_intersect(o, inv_d, nb[:, 0:3], nb[:, 3:6])
        hit = hit & (tmin < t_best) & live

        lf = scene.node_leaf[curc]                      # [N,2]
        first, count = lf[:, 0], lf[:, 1]
        is_leaf = count > 0
        links = scene.node_links[curc * 8 + oct8]       # [N,2]

        do_leaf = hit & is_leaf
        for k in range(leaf_k):
            ti = first + k
            m = do_leaf & (k < count)
            tic = jnp.where(m, ti, 0)
            pack = scene.tri_pack[tic]                  # [N,9]
            tt, uu, vv, ok = moller_trumbore(o, d, pack[:, 0:3], pack[:, 3:6],
                                             pack[:, 6:9])
            ok = ok & m & (tt < t_best) & (ti != skip_tri)
            t_best = jnp.where(ok, tt, t_best)
            tri = jnp.where(ok, ti, tri)
            u = jnp.where(ok, uu, u)
            v = jnp.where(ok, vv, v)

        nxt = jnp.where(hit & ~is_leaf, links[:, 0], links[:, 1])
        cur = jnp.where(live, nxt, -1)
        return cur, t_best, tri, u, v

    init = (cur0, max_t, jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
    _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
    return Hit(t=t, tri=tri, u=u, v=v)


def shadow_factor(scene, o, d, max_t, skip_tri=None, active=None):
    """Any-hit shadow traversal with leaf-BSDF transmission
    (BVHShadowRay, integratorUtilities.cuh:188-288).

    Returns throughput scale [N,3]: 1 for clear, 0 for occluded, and
    albedo*transmission*(1-F_schlick) products for each MAT_LEAF surface
    crossed; a lane terminates early when max-component < 0.01.
    """
    n = o.shape[0]
    max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (n,))
    if skip_tri is None:
        skip_tri = jnp.full((n,), -1, jnp.int32)
    inv_d = safe_inv_dir(d)
    oct8 = _octant(d)
    leaf_k = scene.max_leaf_size
    mats = scene.materials

    cur0 = jnp.zeros((n,), jnp.int32)
    if active is not None:
        cur0 = jnp.where(active, cur0, -1)

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        cur, scale = s
        live = cur >= 0
        curc = jnp.maximum(cur, 0)

        nb = scene.node_bounds[curc]
        tmin, tmax, hit = aabb_intersect(o, inv_d, nb[:, 0:3], nb[:, 3:6])
        hit = hit & (tmin < max_t) & live

        lf = scene.node_leaf[curc]
        first, count = lf[:, 0], lf[:, 1]
        is_leaf = count > 0
        links = scene.node_links[curc * 8 + oct8]

        do_leaf = hit & is_leaf
        blocked = jnp.zeros((n,), bool)
        for k in range(leaf_k):
            ti = first + k
            m = do_leaf & (k < count) & ~blocked
            tic = jnp.where(m, ti, 0)
            pack = scene.tri_pack[tic]
            tt, uu, vv, ok = moller_trumbore(o, d, pack[:, 0:3], pack[:, 3:6],
                                             pack[:, 6:9])
            ok = ok & m & (tt < max_t) & (ti != skip_tri)

            mat_id = scene.tri_mat[tic]
            is_leaf_mat = mats.type[mat_id] == MAT_LEAF
            # leaf transmission: albedo * transmission * (1 - F)
            nrm3 = scene.tri_n[tic]                     # [N,3,3]
            w0 = 1.0 - uu - vv
            nrm = normalize(nrm3[:, 0] * w0[:, None] + nrm3[:, 1] * uu[:, None]
                            + nrm3[:, 2] * vv[:, None])
            cos_t = jnp.abs(dot(d, nrm))
            ior = mats.ior[mat_id]
            r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
            fres = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
            leaf_scale = (mats.albedo[mat_id] * mats.transmission[mat_id][:, None]
                          * (1.0 - fres)[:, None])

            pass_leaf = ok & is_leaf_mat
            scale = jnp.where(pass_leaf[:, None], scale * leaf_scale, scale)
            opaque = ok & ~is_leaf_mat
            dark = jnp.max(scale, axis=-1) < 0.01       # early-out threshold
            blocked = blocked | opaque | (pass_leaf & dark)
            scale = jnp.where(blocked[:, None], 0.0, scale)

        nxt = jnp.where(hit & ~is_leaf, links[:, 0], links[:, 1])
        nxt = jnp.where(blocked, -1, nxt)
        cur = jnp.where(live, nxt, -1)
        return cur, scale

    init = (cur0, jnp.ones((n, 3), jnp.float32))
    _, scale = jax.lax.while_loop(cond, body, init)
    return scale


def interpolate_hit(scene, o, d, hit: Hit):
    """Gather + interpolate shading data at hit points — the tail of
    BVHSceneIntersect (integratorUtilities.cuh:107-140).

    Returns dict with point/normal/uv/emission/mat_id/backface/valid.
    The normal is flipped toward the incoming ray; `backface` records the
    flip (for dielectric orientation).
    """
    tic = jnp.maximum(hit.tri, 0)
    w0 = 1.0 - hit.u - hit.v
    n3 = scene.tri_n[tic]
    nrm = normalize(n3[:, 0] * w0[:, None] + n3[:, 1] * hit.u[:, None]
                    + n3[:, 2] * hit.v[:, None])
    backface = dot(nrm, d) > 0.0
    nrm = jnp.where(backface[:, None], -nrm, nrm)

    uv3 = scene.tri_uv[tic]
    uv = (uv3[:, 0] * w0[:, None] + uv3[:, 1] * hit.u[:, None]
          + uv3[:, 2] * hit.v[:, None])

    return dict(
        point=o + d * hit.t[:, None],
        normal=nrm,
        uv=uv,
        emission=scene.tri_emission[tic],
        mat_id=scene.tri_mat[tic],
        light_ind=scene.tri_light[tic],
        backface=backface,
        valid=hit.valid,
        t=hit.t,
        tri=hit.tri,
    )
