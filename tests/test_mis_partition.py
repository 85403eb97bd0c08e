"""Quantitative MIS invariant: for a FIXED transport path, the BDPT
strategy weights must partition unity (SURVEY.md §4 "Σw within ε of 1";
reference instrument BDPT_PAINTWEIGHT, deviceCode.cu:22).

Scene: a floor quad and a downward-facing area light — every transport
path is exactly camera -> floor(P) -> light(Q) (the planes cannot see
themselves, the camera cannot see the light). That single path class is
covered by exactly three strategies:

  (s=0, t=3) implicit hit        — eye walk BSDF-hits the light
  (s=1, t=2) NEE                 — connect P to a light point
  (s=2, t=1) light-trace splat   — light walk Q->P splatted to the lens

For one concrete path (taken from REAL eye-walk buffers, so the
production d_vcm/d_vc recursion in models/mis.py + models/paths.py is
under test) the three weights are assembled exactly as models/bdpt.py
does and must sum to 1. A perturbation of the d_vc chain must break the
partition — this is the failure mode the test exists to catch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.models import bdpt, mis, paths
from cudapathtracer_tpu.ops import bsdf as bsdf_ops
from cudapathtracer_tpu.scene.builtin import quad
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import Material, build_table
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng
from cudapathtracer_tpu.utils.math import PI, dot, length_sq, normalize, to_local
from cudapathtracer_tpu.utils.obj import MeshData


def _two_plane_scene():
    mats = [Material.diffuse((0.7, 0.7, 0.7)),
            Material.diffuse((0.0, 0.0, 0.0))]
    m = MeshData()
    # floor at y=0 (normal +y), light at y=2 facing down (normal -y)
    quad(m, (-2, 0, -2), (-2, 0, 2), (2, 0, 2), (2, 0, -2), 0)
    quad(m, (-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1), 1,
         emission=(5.0, 5.0, 5.0))
    scene, _ = build_scene(m, mats)
    assert scene.num_lights == 2  # the quad's two triangles
    return scene


def _partition_sums(scene, camera, key, px, py):
    """Return (sums, count): per-lane w_impl + w_nee + w_splat for lanes
    whose eye walk realizes camera->floor->light, and how many there are."""
    n = px.shape[0]
    pid = rng.pixel_ids(px, py)
    ebufs, ev0, _esc, _ = paths.generate_eye_path(scene, camera, key, px, py, 3,
                                            ids=pid)
    ones = jnp.ones((n,), jnp.float32)

    # vertex 1 (buffer j=0): the floor hit; vertex 2 (j=1): the light hit
    sel = (ebufs.valid[0] & (ebufs.light_ind[0] < 0)
           & ebufs.valid[1] & (ebufs.light_ind[1] >= 0)
           & ~ebufs.backface[1])
    p = ebufs.pt[0]
    n0 = ebufs.n[0]
    q = ebufs.pt[1]
    n1 = ebufs.n[1]
    cam_pt = ev0["pt"]
    mat0 = scene.materials.gather(ebufs.mat_id[0])
    num_lights = max(scene.num_lights, 1)
    lidx = jnp.maximum(ebufs.light_ind[1], 0)
    area = scene.light_area[lidx]
    pdf_connect = (1.0 / num_lights) / area
    plane_area = bdpt._plane_area(camera)

    # ---- (s=0, t=3) implicit hit, prev (floor) not delta (bdpt.py:286-296)
    cos_l = jnp.abs(dot(n1, normalize(ebufs.wo[1])))
    w_eye_impl = (pdf_connect * ebufs.d_vcm[1]
                  + pdf_connect * (cos_l / PI) * ebufs.d_vc[1])
    w_impl = 1.0 / (1.0 + w_eye_impl)

    # ---- (s=1, t=2) NEE from P to the SAME light point Q
    # (bdpt.py _bdpt_nee + the s=1 weight assembly, deviceCode.cu:1479-1546)
    stl = q - p
    d2 = length_sq(stl)
    stl_u = stl / jnp.sqrt(d2)[:, None]
    cos_light = dot(n1, -stl_u)          # n1 == interpolated light normal
    pdf_emit_sa = cos_light / PI
    prev_to_curr_local = to_local(normalize(p - cam_pt), n0)
    stl_local = to_local(stl_u, n0)
    pdf_bsdf_sa = bsdf_ops.bsdf_pdf(mat0, -prev_to_curr_local, stl_local,
                                    ones)
    w_light_nee = (pdf_bsdf_sa * jnp.abs(cos_light) / d2) / pdf_connect
    pdf_curr_rev_area = pdf_emit_sa * jnp.abs(stl_local[..., 2]) / d2
    pdf_prev_rev_sa = bsdf_ops.bsdf_pdf(mat0, stl_local,
                                        -prev_to_curr_local, ones)
    w_eye_nee = pdf_curr_rev_area * (ebufs.d_vcm[0]
                                     + pdf_prev_rev_sa * ebufs.d_vc[0])
    w_nee = 1.0 / (1.0 + w_light_nee + w_eye_nee)

    # ---- (s=2, t=1) light-trace splat of the light path Q -> P
    # light-walk accumulators at P via the PRODUCTION recursion
    # (paths.random_walk:101-109 seeds + mis.advance), with the walk's
    # concrete pdfs for this path: emit Q->P cosine, landing cos at P.
    cos_emit = dot(n1, -stl_u)               # cos at Q of direction Q->P
    cos_land = jnp.abs(dot(n0, stl_u))       # cos at P of the incoming dir
    pdf_fwd_area = (cos_emit / PI) * cos_land / d2
    g = cos_emit / d2
    first_vc_scale = 1.0 / pdf_connect
    first_d_vcm = 1.0 / jnp.maximum(pdf_fwd_area, 1e-20)
    first_d_vc = first_vc_scale * g / jnp.maximum(pdf_fwd_area, 1e-20)
    # reverse pdf at P back toward Q given the NEXT direction is toward the
    # camera — not needed for the FIRST advance; call advance exactly as the
    # walk does at depth 1:
    d_vcm_p, d_vc_p, _, _ = mis.advance(
        mis.MisState.zeros(n), True, pdf_fwd_area, g,
        jnp.zeros((n,)), jnp.zeros((n,), bool),
        first_d_vcm, first_d_vc)
    # splat weight (bdpt.py light_trace_splat general branch, 109-138)
    to_cam = cam_pt - p
    d2c = length_sq(to_cam)
    tcu = to_cam / jnp.sqrt(d2c)[:, None]
    cos_cam = jnp.abs(dot(jnp.broadcast_to(camera.forward, tcu.shape), -tcu))
    cos_p_cam = jnp.abs(dot(n0, tcu))
    pdf_trace_cam = cos_p_cam / (d2c * plane_area * cos_cam ** 3)
    to_cam_local = to_local(tcu, n0)
    to_prev_local = to_local(stl_u, n0)      # toward Q (the previous vertex)
    pdf_rev_sa = bsdf_ops.bsdf_pdf(mat0, to_cam_local, to_prev_local, ones)
    w_light_splat = pdf_trace_cam * (d_vcm_p + pdf_rev_sa * d_vc_p)
    w_splat = 1.0 / (1.0 + w_light_splat)

    sums = np.asarray(jnp.where(sel, w_impl + w_nee + w_splat, 1.0))
    return sums, int(np.asarray(sel).sum())


def _setup():
    scene = _two_plane_scene()
    w = h = 16
    camera = Camera.pinhole((0.0, 1.0, 3.0), w, h, -15.0, 0.0, 0.0, 70.0)
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    return scene, camera, px.ravel(), py.ravel()


def test_mis_weights_partition_unity():
    scene, camera, px, py = _setup()
    total = 0
    for seed in range(6):
        key = rng.sample_key(rng.base_key(), seed)
        sums, cnt = _partition_sums(scene, camera, key, px, py)
        total += cnt
        np.testing.assert_allclose(sums, 1.0, rtol=2e-3,
                                   err_msg=f"seed {seed}")
    assert total > 50, f"only {total} camera->floor->light paths realized"


def test_mis_partition_detects_dvc_perturbation(monkeypatch):
    """Scaling the d_vc chain by 5% must break the partition — proves the
    test actually exercises the recursion, not a trivial identity."""
    scene, camera, px, py = _setup()
    key = rng.sample_key(rng.base_key(), 0)

    real_advance = mis.advance

    def bad_advance(*args, **kw):
        d_vcm, d_vc, d_vm, st = real_advance(*args, **kw)
        return d_vcm, d_vc * 1.05, d_vm, st._replace(d_vc=st.d_vc * 1.05)

    monkeypatch.setattr(mis, "advance", bad_advance)
    # paths.py resolves mis.advance at call time through the module object
    sums, cnt = _partition_sums(scene, camera, key, px, py)
    assert cnt > 0
    dev = np.abs(sums - 1.0).max()
    assert dev > 5e-3, f"perturbed recursion went undetected (max dev {dev})"
