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


# ======================================================================
# VCM partition: connection + merge weights (the eta_vcm-bearing terms)
# ======================================================================
#
# Round-4 verdict: the BDPT partition above never exercised the VCM
# connection weight (eta term) nor the merge weight (d_vm chain), so the
# photon-family energy deficit was invisible to it. This section covers a
# THREE-segment path camera -> floor(P1) -> wall(P2) -> light(Q), which is
# realized by exactly six VCM techniques:
#
#   (s=0) implicit hit at Q      (s=1) NEE at P2
#   (s=2) connection P1 <-> P2   (t=1) light-trace splat at P1
#   merge at P1 (photon depth 2) merge at P2 (photon depth 1)
#
# The weights are assembled exactly as models/vcm.py does (eye-side d
# chains from the production recursion via paths.random_walk with
# eta_vcm; light-side chains via mis.advance with the path's concrete
# pdfs) and must sum to 1. The reference's squared-bsdfRatio NEE quirk
# (deviceCode.cu:2533) biases the sum high by <2% on these paths; the
# tolerance accounts for it.


def _three_plane_scene():
    mats = [Material.diffuse((0.7, 0.7, 0.7)),
            Material.diffuse((0.0, 0.0, 0.0))]
    m = MeshData()
    # floor y=0 (+y), back wall z=-2 (+z), light y=2.2 facing down
    quad(m, (-2, 0, -2), (-2, 0, 2), (2, 0, 2), (2, 0, -2), 0)
    quad(m, (-2, 0, -2), (2, 0, -2), (2, 2.5, -2), (-2, 2.5, -2), 0)
    quad(m, (-1, 2.2, -0.5), (1, 2.2, -0.5), (1, 2.2, 1), (-1, 2.2, 1), 1,
         emission=(5.0, 5.0, 5.0))
    scene, _ = build_scene(m, mats)
    assert scene.num_lights == 2
    return scene


def _vcm_partition_sums(scene, camera, key, px, py, eta, nee_squared=True):
    from cudapathtracer_tpu.scene.materials import TRANSPORT_RADIANCE

    n = px.shape[0]
    pid = rng.pixel_ids(px, py)
    ones = jnp.ones((n,), jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    estart, ev0 = paths.start_eye_walk(scene, camera, key, px, py, ids=pid)
    ebufs, _esc, _ = paths.random_walk(scene, key, estart, 4,
                                       TRANSPORT_RADIANCE, eta_vcm=eta,
                                       first_vm_seed=zero, ids=pid)
    cam_pt = ev0["pt"]

    # lanes realizing floor -> wall -> light
    sel = (ebufs.valid[0] & (ebufs.light_ind[0] < 0)
           & ebufs.valid[1] & (ebufs.light_ind[1] < 0)
           & ebufs.valid[2] & (ebufs.light_ind[2] >= 0)
           & ~ebufs.backface[2])
    p1, n1 = ebufs.pt[0], ebufs.n[0]
    p2, n2 = ebufs.pt[1], ebufs.n[1]
    q, nq = ebufs.pt[2], ebufs.n[2]
    mat1 = scene.materials.gather(ebufs.mat_id[0])
    mat2 = scene.materials.gather(ebufs.mat_id[1])
    num_lights = max(scene.num_lights, 1)
    lidx = jnp.maximum(ebufs.light_ind[2], 0)
    pdf_connect = (1.0 / num_lights) / scene.light_area[lidx]
    plane_area = bdpt._plane_area(camera)

    def cosv(nrm, frm, to):
        return jnp.abs(dot(nrm, normalize(to - frm)))

    # ---- light-side accumulators for THIS path via the production
    # recursion: depth 1 at P2 (Q -> P2), depth 2 at P1 (P2 -> P1)
    d2_qp2 = length_sq(p2 - q)
    cos_emit = cosv(nq, q, p2)
    cos_land2 = cosv(n2, p2, q)
    pfa1 = (cos_emit / PI) * cos_land2 / d2_qp2
    g1 = cos_emit / d2_qp2
    fvc = (1.0 / pdf_connect) * g1 / jnp.maximum(pfa1, 1e-20)
    l1_vcm, l1_vc, l1_vm, st1 = mis.advance(
        mis.MisState.zeros(n), True, pfa1, g1,
        (cosv(n2, p2, q) / PI),               # rev: P2 back toward Q
        jnp.zeros((n,), bool),
        1.0 / jnp.maximum(pfa1, 1e-20), fvc,
        fvc / jnp.maximum(eta, 1e-30), eta)
    d2_p21 = length_sq(p1 - p2)
    cos_out2 = cosv(n2, p2, p1)
    cos_land1 = cosv(n1, p1, p2)
    pfa2 = (cos_out2 / PI) * cos_land1 / d2_p21
    g2 = cos_out2 / d2_p21
    l2_vcm, l2_vc, l2_vm, _ = mis.advance(
        st1, False, pfa2, g2,
        (cosv(n1, p1, p2) / PI),              # rev: P1 back toward P2
        jnp.zeros((n,), bool), zero, zero, zero, eta)

    # ---- (s=0) implicit hit at Q (vcm.py, prev=wall not delta)
    cos_l = cosv(nq, q, p2)
    w_eye = (pdf_connect * ebufs.d_vcm[2]
             + pdf_connect * (cos_l / PI) * ebufs.d_vc[2])
    w_impl = 1.0 / (1.0 + w_eye)

    # ---- (s=1) NEE at P2 toward the SAME light point Q
    stl = q - p2
    d2n = length_sq(stl)
    stl_u = stl / jnp.sqrt(d2n)[:, None]
    cos_light = dot(nq, -stl_u)
    stl_local = to_local(stl_u, n2)
    # vcm.py convention: prev_to_curr_local points INTO the surface
    prev_to_curr_loc = to_local(normalize(p2 - p1), n2)
    pdf_bsdf_sa = bsdf_ops.bsdf_pdf(mat2, -prev_to_curr_loc, stl_local, ones)
    ratio = (pdf_bsdf_sa * jnp.abs(cos_light) / d2n) / pdf_connect
    w_light = ratio * ratio if nee_squared else ratio  # quirk (squared)
    pdf_curr_rev_area = (cos_light / PI) * jnp.abs(stl_local[..., 2]) / d2n
    pdf_prev_rev_sa = bsdf_ops.bsdf_pdf(mat2, stl_local, -prev_to_curr_loc,
                                        ones)
    w_eye = pdf_curr_rev_area * (eta + ebufs.d_vcm[1]
                                 + pdf_prev_rev_sa * ebufs.d_vc[1])
    w_nee = 1.0 / (1.0 + w_light + w_eye)

    # ---- (s=2) connection eye P1 <-> light P2 (vcm.py connect_one)
    e2l = p2 - p1
    d2c = length_sq(e2l)
    e2l_u = e2l / jnp.sqrt(d2c)[:, None]
    cos_lc = jnp.abs(dot(n2, -e2l_u))
    cos_ec = jnp.abs(dot(n1, e2l_u))
    l2e_loc_l = to_local(-e2l_u, n2)
    # vcm.py: to_local(-lbufs.wo) — the direction FROM the light-walk's
    # previous vertex (Q) INTO the surface at P2
    to_l_from_prev_loc = to_local(normalize(p2 - q), n2)
    l2e_loc_e = to_local(-e2l_u, n1)
    to_prev_loc_e = to_local(normalize(cam_pt - p1), n1)
    pdf_eye_rev_area = bsdf_ops.bsdf_pdf(
        mat2, -to_l_from_prev_loc, l2e_loc_l, ones) * cos_ec / d2c
    pdf_bef_eye_rev = bsdf_ops.bsdf_pdf(mat1, -l2e_loc_e, to_prev_loc_e,
                                        ones)
    pdf_light_rev_area = bsdf_ops.bsdf_pdf(
        mat1, to_prev_loc_e, -l2e_loc_e, ones) * cos_lc / d2c
    pdf_bef_light_rev = bsdf_ops.bsdf_pdf(mat2, l2e_loc_l,
                                          -to_l_from_prev_loc, ones)
    w_eye = pdf_eye_rev_area * (eta + ebufs.d_vcm[0]
                                + pdf_bef_eye_rev * ebufs.d_vc[0])
    w_light = pdf_light_rev_area * (eta + l1_vcm
                                    + pdf_bef_light_rev * l1_vc)
    w_conn = 1.0 / (1.0 + w_eye + w_light)

    # ---- (t=1) light-trace splat at P1 (vcm_light_splat)
    to_cam = cam_pt - p1
    d2cam = length_sq(to_cam)
    tcu = to_cam / jnp.sqrt(d2cam)[:, None]
    cos_cam = jnp.abs(dot(jnp.broadcast_to(camera.forward, tcu.shape), -tcu))
    cos_p1 = dot(n1, tcu)
    pdf_curr_rev_area = cos_p1 / (d2cam * plane_area * cos_cam ** 3)
    to_cam_local = to_local(tcu, n1)
    to_prev_local = to_local(e2l_u, n1)     # light walk's prev is P2
    pdf_rev_sa = bsdf_ops.bsdf_pdf(mat1, to_cam_local, to_prev_local, ones)
    w_light = pdf_curr_rev_area * (eta + l2_vcm + pdf_rev_sa * l2_vc)
    w_splat = 1.0 / (1.0 + w_light)

    # ---- merge at P1: eye vertex 0, photon = light depth 2 (vcm.py
    # merge_fold: both pdfs evaluated at the EYE vertex's material/frame)
    pdf_eye_rev = bsdf_ops.bsdf_pdf(mat1, to_local(e2l_u, n1),
                                    to_prev_loc_e, ones)
    pdf_light_rev = bsdf_ops.bsdf_pdf(mat1, to_prev_loc_e,
                                      to_local(e2l_u, n1), ones)
    w_eye = ebufs.d_vcm[0] / jnp.maximum(eta, 1e-30) \
        + pdf_eye_rev * ebufs.d_vm[0]
    w_light = l2_vcm / jnp.maximum(eta, 1e-30) + pdf_light_rev * l2_vm
    w_merge1 = 1.0 / (1.0 + w_eye + w_light)

    # ---- merge at P2: eye vertex 1, photon = light depth 1
    eye_prev2 = to_local(normalize(p1 - p2), n2)
    wi2 = to_local(normalize(q - p2), n2)
    pdf_eye_rev = bsdf_ops.bsdf_pdf(mat2, wi2, eye_prev2, ones)
    pdf_light_rev = bsdf_ops.bsdf_pdf(mat2, eye_prev2, wi2, ones)
    w_eye = ebufs.d_vcm[1] / jnp.maximum(eta, 1e-30) \
        + pdf_eye_rev * ebufs.d_vm[1]
    w_light = l1_vcm / jnp.maximum(eta, 1e-30) + pdf_light_rev * l1_vm
    w_merge2 = 1.0 / (1.0 + w_eye + w_light)

    total = w_impl + w_nee + w_conn + w_splat + w_merge1 + w_merge2
    sums = np.asarray(jnp.where(sel, total, 1.0))
    parts = {k: np.asarray(jnp.where(sel, v, 1.0))
             for k, v in dict(impl=w_impl, nee=w_nee, conn=w_conn,
                              splat=w_splat, merge1=w_merge1,
                              merge2=w_merge2).items()}
    return sums, int(np.asarray(sel).sum()), parts


def _vcm_setup():
    scene = _three_plane_scene()
    w = h = 32
    camera = Camera.pinhole((0.0, 1.1, 3.0), w, h, -10.0, 0.0, 0.0, 75.0)
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    return scene, camera, px.ravel(), py.ravel()


@pytest.mark.parametrize("eta", [0.3, 2.0, 10.0])
def test_vcm_partition_unity_with_merge(eta):
    scene, camera, px, py = _vcm_setup()
    total = 0
    for seed in range(2):
        key = rng.sample_key(rng.base_key(), seed)
        # with the reference's squared-bsdfRatio NEE quirk (2533) the sum
        # sits in [1.0, 1.012] (quirk biases HIGH only); with the linear
        # ratio the partition is exact. A missing/broken eta or d_vm term
        # shows as a LOW deviation in both.
        sums, cnt, _ = _vcm_partition_sums(scene, camera, key, px, py,
                                           jnp.float32(eta))
        total += cnt
        assert sums.min() > 1.0 - 2e-3, \
            f"seed {seed}: partition deficit (min {sums.min()})"
        assert sums.max() < 1.0 + 2.5e-2, \
            f"seed {seed}: partition excess (max {sums.max()})"
        lin, _, _ = _vcm_partition_sums(scene, camera, key, px, py,
                                        jnp.float32(eta), nee_squared=False)
        np.testing.assert_allclose(lin, 1.0, rtol=2e-3,
                                   err_msg=f"seed {seed} (linear NEE)")
    assert total > 12, f"only {total} camera->floor->wall->light paths"


def test_vcm_partition_detects_dvm_perturbation(monkeypatch):
    """Scaling the d_vm chain must move the merge weights — proves they are
    genuinely exercised by the harness (the sum alone is insensitive when
    the merge share is small, so the check is on the merge components)."""
    scene, camera, px, py = _vcm_setup()
    key = rng.sample_key(rng.base_key(), 0)
    eta = jnp.float32(2.0)

    _, cnt, good = _vcm_partition_sums(scene, camera, key, px, py, eta)
    assert cnt > 0

    real_advance = mis.advance

    def bad_advance(*args, **kw):
        d_vcm, d_vc, d_vm, st = real_advance(*args, **kw)
        return d_vcm, d_vc, d_vm * 2.0, st._replace(d_vm=st.d_vm * 2.0)

    monkeypatch.setattr(mis, "advance", bad_advance)
    _, _, bad = _vcm_partition_sums(scene, camera, key, px, py, eta)
    for k in ("merge1", "merge2"):
        g = np.asarray(good[k])
        b = np.asarray(bad[k])
        rel = np.abs(b - g) / np.maximum(g, 1e-12)
        assert rel.max() > 0.05, \
            f"{k}: d_vm x2 moved the weight by only {rel.max():.2%}"


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
