"""Unidirectional path tracer with NEE + power-2 MIS, nested dielectrics,
Beer-Lambert absorption and Russian roulette.

Wavefront re-design of Li_unidirectional (deviceCode.cu:285-542). Per-lane
state mirrors the reference's per-thread locals: radiance/throughput, the
previous real intersection (for the BSDF-hits-light MIS counter-pdf), the
clamped previous BSDF pdf, the `hitFirstnonSpecular` gate, the etaI/etaT
pair, and the priority medium stack (vectorized [N,16] — models/common.py).
False hits (lower-priority boundaries crossed while inside a dominant
medium) push/pop the stack and continue the ray with depth-- so Russian
roulette stays unbiased (deviceCode.cu:426-432, 519).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.models import common
from cudapathtracer_tpu.ops import bsdf as bsdf_ops
from cudapathtracer_tpu.ops import traverse
from cudapathtracer_tpu.utils import rng
from cudapathtracer_tpu.utils.math import (EPSILON, RAY_EPSILON, dot,
                                           length_sq, luminance, normalize,
                                           to_local, to_world)

HARD_DEPTH_CAP = 100  # deviceCode.cu:318

# rng draw ids within a bounce
_D_NEE = 0    # ..2 (light pick + 2 warp uniforms)
_D_BSDF = 4   # ..7
_D_RR = 8


class _State(NamedTuple):
    rays: jax.Array        # scalar ray counter (traversals + shadow rays)
    it: jax.Array          # global iteration counter (scalar)
    depth: jax.Array       # [N] per-lane depth (false hits decrement)
    o: jax.Array
    d: jax.Array
    beta: jax.Array
    li: jax.Array
    alive: jax.Array
    prev_pdf: jax.Array        # clamped bsdf pdf of last real bounce
    hit_nonspec: jax.Array     # hitFirstnonSpecular gate
    prev_point: jax.Array      # previousintersectREAL.point
    eta_i: jax.Array
    eta_t: jax.Array
    ms_stack: jax.Array
    ms_top: jax.Array
    pid: jax.Array             # [N] stable pixel ids (rng *_id streams)


_BOUNCE_COMPACT_FRAC = 4


def _compacted_loop(cond, body, init: "_State", n: int, min_width: int):
    """Bounce-level straggler compaction (common.compacted_loop): dead
    lanes stop paying for shading, NEE and RNG. Bit-transparent: all
    sampling is keyed by per-pixel ids (utils/rng.py *_id streams),
    never by lane position."""
    return common.compacted_loop(cond, body, init, n, min_width,
                                 frac=_BOUNCE_COMPACT_FRAC)


@partial(jax.jit, static_argnames=("max_depth", "use_mis",
                                   "sample_environment", "compact_min_width"))
def render_sample(scene, camera, base_key, sample_idx, px, py, *,
                  max_depth: int, use_mis: bool = True,
                  sample_environment: bool = False,
                  compact_min_width: int = 8192):
    """Trace one full sample for pixels (px, py) [N] -> radiance [N,3]."""
    n = px.shape[0]
    skey = rng.sample_key(base_key, sample_idx)
    pid = rng.pixel_ids(px, py)
    o, d = camera.generate_rays(jax.random.fold_in(skey, 2 ** 20),
                                px.astype(jnp.float32), py.astype(jnp.float32),
                                ids=pid)
    mats = scene.materials
    ms0 = common.MediumStack.make(n, mats.priority[0])

    def cond(s: _State):
        return (s.it < HARD_DEPTH_CAP + 32) & jnp.any(s.alive)

    def body(s: _State):
        pid = s.pid
        bkey = rng.bounce_key(skey, s.it)
        ms = common.MediumStack(s.ms_stack, s.ms_top)
        rays = s.rays + jnp.sum(s.alive.astype(jnp.int32))

        hit = traverse.closest_hit(scene, s.o, s.d, active=s.alive)
        info, mat = traverse.shade_data(scene, s.o, s.d, hit)
        miss = s.alive & ~hit.valid
        li = s.li + jnp.where(miss[:, None],
                              s.beta * common.sample_sky(s.d, sample_environment),
                              0.0)
        alive = s.alive & hit.valid

        mat_id = info["mat_id"]
        backface = info["backface"]
        normal = info["normal"]
        wi_local = to_local(s.d, normal)
        albedo = bsdf_ops.resolve_albedo(scene, mat, info["uv"])
        trans = bsdf_ops.resolve_transmission(scene, mat, info["uv"])
        is_specular = mat.is_specular

        # --- dominant medium + Beer-Lambert absorption (deviceCode.cu:345-369)
        dom_id, dom_pri = common.dominant_medium(ms)
        absorb = common.table_lookup(mats.absorption, dom_id)
        att = jnp.exp(-absorb * hit.t[:, None])
        beta = jnp.where((alive & (hit.t > EPSILON))[:, None], s.beta * att,
                         s.beta)

        # --- boundary / priority logic (deviceCode.cu:372-432)
        is_boundary = mat.boundary
        true_hit = ~(is_boundary & (mat.priority > dom_pri)) | ~alive
        false_hit = alive & ~true_hit

        # etaI/etaT for a true dielectric boundary hit
        dom_ior = common.table_lookup(mats.ior, dom_id)
        second = common.second_lowest_medium(ms, mat_id)
        eta_t_exit = jnp.where(ms.top == 1, 1.0,
                               common.table_lookup(mats.ior, second))
        is_dielectric_hit = (alive & true_hit & is_boundary
                             & (mat.type == 2))  # MAT_SMOOTHDIELECTRIC
        eta_i = jnp.where(is_dielectric_hit, dom_ior, s.eta_i)
        eta_t = jnp.where(is_dielectric_hit,
                          jnp.where(backface, eta_t_exit, mat.ior), s.eta_t)
        # non-boundary: etaI = dominant ior (for thin-walled), etaT untouched
        non_boundary = alive & ~is_boundary
        eta_i = jnp.where(non_boundary, dom_ior, eta_i)

        # false hit: push (entering) / pop (exiting) the crossed boundary
        ms = common.stack_push(ms, mat_id, mat.priority,
                               false_hit & ~backface)
        ms = common.stack_remove(ms, mat_id, false_hit & backface)

        # --- emission (deviceCode.cu:438-455)
        emissive = length_sq(info["emission"]) > EPSILON
        direct_view = (s.depth == 0) | ~s.hit_nonspec
        shade = alive & true_hit
        add_direct = shade & emissive & direct_view
        li = li + jnp.where(add_direct[:, None], beta * info["emission"], 0.0)

        if use_mis:
            # BSDF-sampled ray hit a light: weigh against the NEE pdf
            light_pdf_hit = common.nee_pdf(
                scene, s.prev_point, info["point"],
                info["normal_a"], info["area"])
            w_bsdf = common.power2_weight(s.prev_pdf, light_pdf_hit)
            add_mis = (shade & emissive & ~direct_view & ~is_specular
                       & (light_pdf_hit > EPSILON))
            li = li + jnp.where(add_mis[:, None],
                                beta * info["emission"] * w_bsdf[:, None], 0.0)

            # --- NEE from non-emissive, non-specular surfaces
            do_nee = shade & ~emissive & ~is_specular
            rays = rays + jnp.sum(do_nee.astype(jnp.int32))
            nee_c, light_pdf, wo_nee = common.next_event_estimation(
                scene, bkey, _D_NEE, info["point"], normal, wi_local, mat,
                albedo, eta_i, do_nee, ids=pid, transmission=trans)
            bsdf_pdf_nee = bsdf_ops.bsdf_pdf(mat, -wi_local, wo_nee, eta_i,
                                             transmission=trans)
            w_nee = common.power2_weight(light_pdf, bsdf_pdf_nee)
            li = li + jnp.where((do_nee & (light_pdf > EPSILON))[:, None],
                                beta * nee_c * w_nee[:, None], 0.0)

        # --- BSDF sampling (deviceCode.cu:476-479)
        wo_local, f_val, pdf = bsdf_ops.bsdf_sample(
            bkey, _D_BSDF, mat, albedo, -wi_local, backface, eta_i, ids=pid,
            transmission=trans)
        pdf = jnp.maximum(pdf, 0.01)  # deviceCode.cu:481

        # medium stack push/pop on refraction through a true-hit boundary
        refracted = wo_local[..., 2] < 0.0
        ms = common.stack_push(ms, mat_id, mat.priority,
                               shade & refracted & ~backface)
        ms = common.stack_remove(ms, mat_id, shade & refracted & backface)

        new_beta = beta * f_val * (jnp.abs(wo_local[..., 2]) / pdf)[:, None]
        beta = jnp.where(shade[:, None], new_beta, beta)

        wo_world = normalize(to_world(wo_local, normal))
        side = jnp.where(wo_local[..., 2] > 0.0, 1.0, -1.0)
        o_true = info["point"] + normal * (side * EPSILON)[:, None]
        # false hit: pass straight through (deviceCode.cu:512)
        o_false = info["point"] + s.d * RAY_EPSILON
        o = jnp.where(shade[:, None], o_true,
                      jnp.where(false_hit[:, None], o_false, s.o))
        d = jnp.where(shade[:, None], wo_world, s.d)

        prev_pdf = jnp.where(shade, pdf, s.prev_pdf)
        prev_point = jnp.where(shade[:, None], info["point"], s.prev_point)
        depth = s.depth + jnp.where(false_hit, 0, 1)  # false hits: depth-- then ++

        # --- Russian roulette past maxDepth (deviceCode.cu:523-532)
        rr_zone = alive & (depth > max_depth + 1)
        p_surv = jnp.clip(luminance(beta), 0.05, 0.99)
        u_rr = rng.uniform_id(bkey, _D_RR, pid)
        killed = rr_zone & (u_rr > p_surv)
        beta = jnp.where((rr_zone & ~killed)[:, None], beta / p_surv[:, None],
                         beta)
        alive = alive & ~killed & (depth < HARD_DEPTH_CAP)

        hit_nonspec = s.hit_nonspec | (alive & ~is_specular)

        return _State(rays, s.it + 1, depth, o, d, beta, li, alive, prev_pdf,
                      hit_nonspec, prev_point, eta_i, eta_t, ms.stack, ms.top,
                      s.pid)

    init = _State(
        rays=jnp.int32(0),
        it=jnp.int32(0),
        depth=jnp.zeros((n,), jnp.int32),
        o=o, d=d,
        beta=jnp.ones((n, 3), jnp.float32),
        li=jnp.zeros((n, 3), jnp.float32),
        alive=jnp.ones((n,), bool),
        prev_pdf=jnp.full((n,), EPSILON, jnp.float32),
        hit_nonspec=jnp.zeros((n,), bool),
        prev_point=jnp.zeros((n, 3), jnp.float32),
        eta_i=jnp.full((n,), EPSILON, jnp.float32),
        eta_t=jnp.full((n,), EPSILON, jnp.float32),
        ms_stack=ms0.stack, ms_top=ms0.top,
        pid=pid)
    out = _compacted_loop(cond, body, init, n, compact_min_width)
    return out.li, out.rays
