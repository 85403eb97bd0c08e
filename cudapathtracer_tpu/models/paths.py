"""Path-vertex buffers + random-walk generation for BDPT/VCM.

Wavefront re-design of the reference's per-thread path generation
(generateEyePath deviceCode.cu:751-953, generateLightPath 1081-1287): the
whole pixel batch walks together via lax.scan over depth, producing
DEPTH-MAJOR SoA buffers [D, N, ...]. Depth-major matters: the BDPT
connection pass loops over static (t, s) pairs, so every vertex access is a
static slice — zero gathers in the O(E*L) connection stage.

The d_vcm/d_vc recursive MIS accumulators follow models/mis.py; eye and
light walks differ only in their endpoint seeding and transport mode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.models import common, mis
from cudapathtracer_tpu.ops import bsdf as bsdf_ops
from cudapathtracer_tpu.ops import traverse
from cudapathtracer_tpu.scene.materials import (TRANSPORT_IMPORTANCE,
                                                TRANSPORT_RADIANCE)
from cudapathtracer_tpu.utils import packing, rng
from cudapathtracer_tpu.utils.math import (EPSILON, PI, RAY_EPSILON, dot,
                                           length_sq, normalize, to_local,
                                           to_world)


class PathBuffers(NamedTuple):
    """Depth-major SoA path storage, PACKED; all arrays [D, N, ...].

    Field-parity with the reference PathVertices (objects.cuh:437-484), in
    the reference's SHIPPED compressed layout (packed VCMPathVertices,
    objects.cuh:958-1157): octahedral-encoded unit vectors (one uint32
    each), half-precision beta and uv (objects.cuh:1123-1133), and a single
    packed (isDelta | backface | lightInd | matID) flag word
    (objects.cuh:945-1004) — ~44 B/vertex instead of ~85, which halves the
    HBM traffic of the BDPT/VCM connection and splat stages.

    Consumers read decoded views through the properties (n, wo, uv, beta,
    is_delta, backface, light_ind, mat_id); the decodes are elementwise, so
    XLA commutes them with the per-row picks and only the rows actually
    read are decoded. MIS quantities (pdf_fwd, d_vcm, d_vc, d_vm) stay
    float32 — the recursive weights are precision-critical.
    """
    pt: jax.Array         # [D,N,3] f32
    n_oct: jax.Array      # [D,N] u32 oct-encoded shading normal
    wo_oct: jax.Array     # [D,N] u32 oct-encoded unit vector to PREV vertex
    uv_h: jax.Array       # [D,N,2] f16
    beta_h: jax.Array     # [D,N,3] f16 throughput at the vertex
    pdf_fwd: jax.Array    # [D,N] area pdf of generating the vertex
    d_vcm: jax.Array      # [D,N]
    d_vc: jax.Array       # [D,N]
    d_vm: jax.Array       # [D,N] (VCM only; None on BDPT walks)
    flags: jax.Array      # [D,N] u32 (isDelta|backface|lightInd+1|matID)
    valid: jax.Array      # [D,N] bool

    @classmethod
    def encode(cls, *, pt, n, wo, uv, beta, pdf_fwd, d_vcm, d_vc, d_vm,
               is_delta, backface, light_ind, mat_id, valid):
        return cls(pt=pt, n_oct=packing.pack_oct(n),
                   wo_oct=packing.pack_oct(wo),
                   uv_h=uv.astype(jnp.float16),
                   beta_h=packing.to_half3(beta),
                   pdf_fwd=pdf_fwd, d_vcm=d_vcm, d_vc=d_vc, d_vm=d_vm,
                   flags=packing.pack_flags(is_delta, backface, light_ind,
                                            mat_id),
                   valid=valid)

    @property
    def n(self):
        return packing.unpack_oct(self.n_oct)

    @property
    def wo(self):
        return packing.unpack_oct(self.wo_oct)

    @property
    def uv(self):
        return self.uv_h.astype(jnp.float32)

    @property
    def beta(self):
        return packing.from_half3(self.beta_h)

    @property
    def is_delta(self):
        return packing.unpack_flags(self.flags)[0]

    @property
    def backface(self):
        return packing.unpack_flags(self.flags)[1]

    @property
    def light_ind(self):
        return packing.unpack_flags(self.flags)[2]

    @property
    def mat_id(self):
        return packing.unpack_flags(self.flags)[3]


class Escape(NamedTuple):
    """First scene miss along a walk (all [N...]): the surviving throughput
    and direction of the ray that left the scene. Consumed by the
    environment-light extension (the reference leaves its BDPT/VCM env
    branches unimplemented, deviceCode.cu:1541/1558/2386; this framework
    wires the escape through when SAMPLE_ENVIRONMENT is on — the sky is
    reachable ONLY by escaping, so the contribution takes MIS weight 1)."""
    valid: jax.Array   # [N] bool — the walk escaped the scene
    d: jax.Array       # [N,3] escape direction
    beta: jax.Array    # [N,3] throughput carried out of the scene


class WalkStart(NamedTuple):
    """Endpoint state feeding the walk (all [N...])."""
    o: jax.Array              # ray origin
    d: jax.Array              # ray direction (unit)
    throughput: jax.Array     # [N,3]
    prev_pdf_sa: jax.Array    # solid-angle pdf of the emitted direction
    prev_cos: jax.Array       # |cos| at the endpoint
    prev_pt: jax.Array        # endpoint position
    first_vc_scale: jax.Array  # 0 for eye; 1/pdf_trace for light walks


def random_walk(scene, key, start: WalkStart, max_depth: int,
                transport_mode: int, eta_vcm=None, first_vm_seed=None,
                ids=None):
    """Walk vertices 1..max_depth-1. Returns (PathBuffers [max_depth-1, N],
    Escape, rays traced scalar). Vertex indices in the buffers are
    depth-1."""
    n = start.o.shape[0]

    def body(carry, depth):
        (o, d, thr, prev_pdf_sa, prev_cos, prev_pt, mstate, alive, esc,
         rays) = carry
        bkey = rng.bounce_key(key, depth)
        rays = rays + jnp.sum(alive.astype(jnp.int32))

        hit = traverse.closest_hit(scene, o, d, active=alive)
        info = traverse.interpolate_hit(scene, o, d, hit)
        reached = alive & hit.valid
        # first miss of the walk (alive dies on a miss, so at most one)
        missed = alive & ~hit.valid
        esc = Escape(valid=esc.valid | missed,
                     d=jnp.where(missed[:, None], d, esc.d),
                     beta=jnp.where(missed[:, None], thr, esc.beta))

        normal = info["normal"]
        wo_local = to_local(d, normal)           # incoming dir, z < 0
        mat = scene.materials.gather(info["mat_id"])
        albedo = bsdf_ops.resolve_albedo(scene, mat, info["uv"])
        trans = bsdf_ops.resolve_transmission(scene, mat, info["uv"])
        cur_delta = mat.is_specular

        d2 = jnp.maximum(length_sq(info["point"] - prev_pt), RAY_EPSILON)
        pdf_fwd_area = prev_pdf_sa * jnp.abs(wo_local[..., 2]) / d2
        g = prev_cos / d2

        eta_i = jnp.ones((n,), jnp.float32)  # deviceCode.cu:851 "TEMPORARY"
        wi_local, f_val, pdf_sa = bsdf_ops.bsdf_sample(
            bkey, 0, mat, albedo, -wo_local, info["backface"], eta_i,
            transport_mode, ids=ids, transmission=trans)
        # reverse pdf: scattering from here back toward the previous vertex
        pdf_rev_sa = bsdf_ops.bsdf_pdf(mat, wi_local, -wo_local, eta_i,
                                       transmission=trans)

        first = depth == 1
        first_d_vcm = 1.0 / jnp.maximum(pdf_fwd_area, 1e-20)
        first_d_vc = start.first_vc_scale * g / jnp.maximum(pdf_fwd_area, 1e-20)
        first_d_vm = None
        if first_vm_seed is not None:
            first_d_vm = first_vm_seed * g / jnp.maximum(pdf_fwd_area, 1e-20)
        d_vcm, d_vc, d_vm, mstate2 = mis.advance(
            mstate, first, pdf_fwd_area, g, pdf_rev_sa, cur_delta,
            first_d_vcm, first_d_vc, first_d_vm, eta_vcm)

        valid = reached & (pdf_sa >= EPSILON)

        out = PathBuffers.encode(
            pt=info["point"], n=normal, wo=normalize(-d), uv=info["uv"],
            beta=thr, pdf_fwd=pdf_fwd_area, d_vcm=d_vcm, d_vc=d_vc, d_vm=d_vm,
            is_delta=cur_delta, backface=info["backface"],
            light_ind=info["light_ind"], mat_id=info["mat_id"], valid=valid)

        # continue the walk
        new_thr = thr * f_val * (jnp.abs(wi_local[..., 2])
                                 / jnp.maximum(pdf_sa, 1e-20))[:, None]
        wi_world = normalize(to_world(wi_local, normal))
        transmitting = dot(wi_world, normal) < 0.0
        side = jnp.where(transmitting, -1.0, 1.0)
        new_o = info["point"] + normal * (side * RAY_EPSILON)[:, None]

        upd = valid[:, None]
        carry2 = (jnp.where(upd, new_o, o), jnp.where(upd, wi_world, d),
                  jnp.where(upd, new_thr, thr),
                  jnp.where(valid, pdf_sa, prev_pdf_sa),
                  jnp.where(valid, jnp.abs(wi_local[..., 2]), prev_cos),
                  jnp.where(upd, info["point"], prev_pt),
                  jax.tree.map(lambda a2, a1: jnp.where(valid, a2, a1),
                               mstate2, mstate),
                  valid, esc, rays)
        return carry2, out

    mstate0 = mis.MisState.zeros(n)
    esc0 = Escape(valid=jnp.zeros((n,), bool),
                  d=start.d, beta=start.throughput)
    carry0 = (start.o, start.d, start.throughput, start.prev_pdf_sa,
              start.prev_cos, start.prev_pt, mstate0,
              jnp.ones((n,), bool), esc0, jnp.int32(0))
    depths = jnp.arange(1, max_depth)
    carry, out = jax.lax.scan(body, carry0, depths)
    return out, carry[-2], carry[-1]


def start_eye_walk(scene, camera, key, px, py,
                   ids=None) -> tuple[WalkStart, dict]:
    """Camera endpoint (generateEyePath head, deviceCode.cu:758-790).
    Returns (WalkStart, vertex0 dict for the connection pass)."""
    o, d = camera.generate_rays(jax.random.fold_in(key, 2 ** 20),
                                px.astype(jnp.float32), py.astype(jnp.float32),
                                ids=ids)
    n = o.shape[0]
    aspect = camera.width / camera.height
    plane_area = 4.0 * aspect * camera.fov_scale * camera.fov_scale
    cos_cam = jnp.abs(dot(jnp.broadcast_to(camera.forward, d.shape), d))
    pdf_sa = 1.0 / (plane_area * cos_cam ** 3)
    v0 = dict(pt=o, n=jnp.broadcast_to(camera.forward, d.shape))
    return WalkStart(o=o, d=d, throughput=jnp.ones((n, 3), jnp.float32),
                     prev_pdf_sa=pdf_sa, prev_cos=cos_cam, prev_pt=o,
                     first_vc_scale=jnp.zeros((n,), jnp.float32)), v0


def start_light_walk(scene, key, n, ids=None) -> tuple[WalkStart, dict]:
    """Light endpoint (generateFirstLightPathVertex, deviceCode.cu:955-1020):
    uniform light pick, sqrt-warp area sample with INTERPOLATED normal,
    cosine emission; beta0 = Le*pi/pdf0. Returns (WalkStart, vertex0 dict)."""
    ul = rng.uniform_any(key, 100, n, ids)
    num = max(scene.num_lights, 1)
    li = jnp.minimum((ul * num).astype(jnp.int32), num - 1)
    a, b, c = scene.light_p0[li], scene.light_p1[li], scene.light_p2[li]
    tri = scene.light_tri[li]
    n3 = scene.tri_n[tri]

    u = jnp.sqrt(rng.uniform_any(key, 101, n, ids))
    v = rng.uniform_any(key, 102, n, ids)
    w0, w1, w2 = (1.0 - u), u * (1.0 - v), u * v
    pt = w0[:, None] * a + w1[:, None] * b + w2[:, None] * c
    nrm = normalize(w0[:, None] * n3[:, 0] + w1[:, None] * n3[:, 1]
                    + w2[:, None] * n3[:, 2])

    area = scene.light_area[li]
    pdf0 = (1.0 / num) / jnp.maximum(area, 1e-20)
    le = scene.light_emission[li]
    beta0 = le * (PI / pdf0)[:, None]

    u1 = rng.uniform_any(key, 103, n, ids)
    u2 = rng.uniform_any(key, 104, n, ids)
    out_local = bsdf_ops.cosine_sample(u1, u2)
    out_world = to_world(out_local, nrm)
    cos_emit = jnp.abs(out_local[..., 2])

    v0 = dict(pt=pt, n=nrm, beta=beta0, pdf_fwd=pdf0, light_ind=li,
              mat_id=scene.tri_mat[tri], tri=tri)
    start = WalkStart(
        o=pt + nrm * RAY_EPSILON, d=out_world, throughput=beta0,
        prev_pdf_sa=cos_emit / PI, prev_cos=cos_emit, prev_pt=pt,
        first_vc_scale=1.0 / jnp.maximum(pdf0, 1e-20))
    return start, v0


def generate_eye_path(scene, camera, key, px, py, max_depth: int, ids=None):
    """Returns (bufs, v0, escape, rays) — escape feeds the env light."""
    start, v0 = start_eye_walk(scene, camera, key, px, py, ids)
    bufs, esc, rays = random_walk(scene, key, start, max_depth,
                                  TRANSPORT_RADIANCE, ids=ids)
    return bufs, v0, esc, rays


def generate_light_path(scene, key, n, max_depth: int, eta_vcm=None,
                        first_vm_seed=None, ids=None):
    start, v0 = start_light_walk(scene, key, n, ids)
    bufs, _esc, rays = random_walk(scene, key, start, max_depth,
                                   TRANSPORT_IMPORTANCE, eta_vcm,
                                   first_vm_seed, ids=ids)
    return bufs, v0, rays
