"""Lane-major pipeline (ops/lanemajor.py) must match the row-major
originals lane-for-lane — same math, different layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.models import common
from cudapathtracer_tpu.ops import bsdf as bsdf_ops
from cudapathtracer_tpu.ops import lanemajor as lm
from cudapathtracer_tpu.ops import traverse
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng
from cudapathtracer_tpu.utils.math import to_local

N = 257  # deliberately not a multiple of 128


@pytest.fixture(scope="module")
def scene():
    from cudapathtracer_tpu.scene.textures import reference_atlas
    atlas, wins = reference_atlas()
    s, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials(wins),
                       atlas)
    return s


@pytest.fixture(scope="module")
def hits(scene):
    """A batch of real hits + shading geometry shared by the tests."""
    cam = Camera.pinhole((0.0, 0.0, 1.0), 64, 64, 0.0, 0.0, 0.0, 60.0)
    k = rng.base_key()
    px = jnp.arange(N) % 64
    py = (jnp.arange(N) * 7) % 64
    ids = rng.pixel_ids(px, py)
    o, d = cam.generate_rays(k, px.astype(jnp.float32),
                             py.astype(jnp.float32), ids=ids)
    hit = traverse.closest_hit(scene, o, d)
    return o, d, hit, ids


def _mats(scene, mat_ids):
    return scene.materials.gather(mat_ids)


def _matT_from_rowmajor(mat):
    """Transpose a row-major MaterialTable batch into lanemajor.MatT."""
    return lm.MatT(
        type=mat.type, albedo=mat.albedo.T, roughness=mat.roughness,
        eta=mat.eta.T, k=mat.k.T, ior=mat.ior,
        transmission=mat.transmission, is_specular=mat.is_specular,
        boundary=mat.boundary, thin_walled=mat.thin_walled,
        absorption=mat.absorption.T, priority=mat.priority,
        tex_start=mat.tex_start, tex_width=mat.tex_width,
        tex_height=mat.tex_height, trans_tex_start=mat.trans_tex_start,
        trans_tex_width=mat.trans_tex_width,
        trans_tex_height=mat.trans_tex_height)


def _rand_dirs(key, n, up=True):
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    if up:
        d = d * jnp.where(d[:, 2:3] < 0, -1.0, 1.0)
        d = d.at[:, 2].set(jnp.maximum(d[:, 2], 1e-3))
    return d


def test_vector_substrate():
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (N, 3))
    b = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
    np.testing.assert_allclose(lm.dotT(a.T, b.T),
                               jnp.sum(a * b, axis=-1), rtol=1e-6)
    np.testing.assert_allclose(lm.crossT(a.T, b.T), jnp.cross(a, b).T,
                               rtol=1e-5, atol=1e-6)
    from cudapathtracer_tpu.utils.math import normalize
    np.testing.assert_allclose(lm.normalizeT(a.T), normalize(a).T, rtol=1e-6)
    nrm = _rand_dirs(k, N, up=False)
    v = _rand_dirs(jax.random.fold_in(k, 2), N, up=False)
    np.testing.assert_allclose(lm.to_localT(v.T, nrm.T),
                               to_local(v, nrm).T, rtol=1e-5, atol=1e-6)
    from cudapathtracer_tpu.utils.math import to_world
    np.testing.assert_allclose(lm.to_worldT(v.T, nrm.T),
                               to_world(v, nrm).T, rtol=1e-5, atol=1e-6)


def test_shade_data_equivalence(scene, hits):
    o, d, hit, _ = hits
    info, mat = traverse.shade_data(scene, o, d, hit)
    infoT, matT = lm.shade_dataT(scene, o.T, d.T, hit)
    for key3 in ("point", "normal", "emission", "normal_a"):
        np.testing.assert_allclose(infoT[key3], info[key3].T, rtol=1e-6,
                                   atol=1e-6, err_msg=key3)
    np.testing.assert_allclose(infoT["uv"], info["uv"].T, atol=1e-6)
    for keys in ("light_ind", "mat_id", "area"):
        np.testing.assert_array_equal(np.asarray(infoT[keys]),
                                      np.asarray(info[keys]), err_msg=keys)
    np.testing.assert_array_equal(np.asarray(infoT["backface"]),
                                  np.asarray(info["backface"]))
    ref = _matT_from_rowmajor(mat)
    for f in lm.MatT._fields:
        np.testing.assert_allclose(np.asarray(getattr(matT, f)),
                                   np.asarray(getattr(ref, f)),
                                   atol=1e-6, err_msg=f)


def test_texture_and_albedo_equivalence(scene, hits):
    o, d, hit, _ = hits
    info, mat = traverse.shade_data(scene, o, d, hit)
    matT = _matT_from_rowmajor(mat)
    alb = bsdf_ops.resolve_albedo(scene, mat, info["uv"])
    albT = lm.resolve_albedoT(scene, matT, info["uv"].T)
    np.testing.assert_allclose(albT, alb.T, atol=1e-6)
    tr = bsdf_ops.resolve_transmission(scene, mat, info["uv"])
    trT = lm.resolve_transmissionT(scene, matT, info["uv"].T)
    np.testing.assert_allclose(trT, tr, atol=1e-6)


def test_bsdf_f_pdf_equivalence(scene):
    k = jax.random.PRNGKey(3)
    wi = _rand_dirs(k, N)
    wo = _rand_dirs(jax.random.fold_in(k, 1), N, up=False)
    mat_ids = jnp.arange(N) % scene.materials.count
    mat = _mats(scene, mat_ids)
    matT = _matT_from_rowmajor(mat)
    albedo = mat.albedo
    eta_i = jnp.full((N,), 1.2)
    f = bsdf_ops.bsdf_f(mat, albedo, wi, wo, eta_i)
    fT = lm.bsdf_fT(matT, albedo.T, wi.T, wo.T, eta_i)
    np.testing.assert_allclose(fT, f.T, rtol=1e-5, atol=1e-5)
    pdf = bsdf_ops.bsdf_pdf(mat, wi, wo, eta_i)
    pdfT = lm.bsdf_pdfT(matT, wi.T, wo.T, eta_i)
    np.testing.assert_allclose(pdfT, pdf, rtol=1e-5, atol=1e-5)


def test_bsdf_sample_equivalence(scene):
    k = rng.base_key()
    wi = _rand_dirs(jax.random.PRNGKey(7), N)
    backface = (jnp.arange(N) % 5) == 0
    mat_ids = jnp.arange(N) % scene.materials.count
    mat = _mats(scene, mat_ids)
    matT = _matT_from_rowmajor(mat)
    ids = jnp.arange(N, dtype=jnp.int32) * 31
    eta_i = jnp.full((N,), 1.1)
    wo, f, pdf = bsdf_ops.bsdf_sample(k, 4, mat, mat.albedo, wi, backface,
                                      eta_i, ids=ids)
    woT, fT, pdfT = lm.bsdf_sampleT(k, 4, matT, mat.albedo.T, wi.T,
                                    backface, eta_i, ids=ids)
    np.testing.assert_allclose(woT, wo.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fT, f.T, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(pdfT, pdf, rtol=1e-4, atol=1e-5)


def test_nee_sample_equivalence(scene, hits):
    o, d, hit, ids = hits
    info, mat = traverse.shade_data(scene, o, d, hit)
    matT = _matT_from_rowmajor(mat)
    normal = info["normal"]
    wi_local = to_local(d, normal)
    albedo = bsdf_ops.resolve_albedo(scene, mat, info["uv"])
    k = rng.base_key()
    active = hit.valid
    ns = common.nee_sample(scene, k, 0, info["point"], normal, wi_local,
                           mat, albedo, jnp.ones((N,)), active, ids=ids)
    nsT = lm.nee_sampleT(scene, k, 0, info["point"].T, normal.T,
                         wi_local.T, matT, albedo.T, jnp.ones((N,)),
                         active, ids=ids)
    np.testing.assert_allclose(nsT.contrib, ns.contrib.T, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(nsT.light_pdf, ns.light_pdf, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(nsT.wo_local, ns.wo_local.T, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(nsT.origin, ns.origin.T, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(nsT.dir, ns.dir.T, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(nsT.max_t, ns.max_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nsT.active),
                                  np.asarray(ns.active))


def test_medium_stack_equivalence():
    k = jax.random.PRNGKey(11)
    ms = common.MediumStack.make(N, air_priority=0)
    msT = lm.MediumStackT.make(N)
    for step in range(6):
        kk = jax.random.fold_in(k, step)
        mat_id = jax.random.randint(kk, (N,), 0, 24)
        pri = jax.random.randint(jax.random.fold_in(kk, 1), (N,), 0, 8)
        push = jax.random.uniform(jax.random.fold_in(kk, 2), (N,)) < 0.6
        ms = common.stack_push(ms, mat_id, pri, push)
        msT = lm.stack_pushT(msT, mat_id, pri, push)
        rem = jax.random.uniform(jax.random.fold_in(kk, 3), (N,)) < 0.3
        ms = common.stack_remove(ms, mat_id, rem)
        msT = lm.stack_removeT(msT, mat_id, rem)
        np.testing.assert_array_equal(np.asarray(msT.stack),
                                      np.asarray(ms.stack.T))
        np.testing.assert_array_equal(np.asarray(msT.top),
                                      np.asarray(ms.top))
    dom_id, dom_pri = common.dominant_medium(ms)
    dom_idT, dom_priT = lm.dominant_mediumT(msT)
    np.testing.assert_array_equal(np.asarray(dom_idT), np.asarray(dom_id))
    np.testing.assert_array_equal(np.asarray(dom_priT), np.asarray(dom_pri))
    excl = jax.random.randint(k, (N,), 0, 24)
    np.testing.assert_array_equal(
        np.asarray(lm.second_lowest_mediumT(msT, excl)),
        np.asarray(common.second_lowest_medium(ms, excl)))


def test_generate_rays_equivalence():
    for cam in (Camera.pinhole((0.1, -0.2, 1.0), 64, 48, 5.0, -3.0, 1.0,
                               55.0),
                Camera.thin_lens((0.0, 0.0, 1.5), 64, 48, 0.0, 10.0, 0.0,
                                 60.0, 0.05, 1.2)):
        k = rng.base_key()
        px = (jnp.arange(N) % 64).astype(jnp.float32)
        py = ((jnp.arange(N) * 3) % 48).astype(jnp.float32)
        ids = rng.pixel_ids(px.astype(jnp.int32), py.astype(jnp.int32))
        o, d = cam.generate_rays(k, px, py, ids=ids)
        oT, dT = lm.generate_raysT(cam, k, px, py, ids=ids)
        np.testing.assert_allclose(oT, o.T, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(dT, d.T, rtol=1e-5, atol=1e-6)


def test_sky_equivalence():
    d = _rand_dirs(jax.random.PRNGKey(5), N, up=False)
    np.testing.assert_allclose(lm.sample_skyT(d.T, True),
                               common.sample_sky(d, True).T, rtol=1e-5,
                               atol=1e-6)
    assert (lm.sample_skyT(d.T, False) == 0).all()


def test_nee_pdf_equivalence(scene):
    k = jax.random.PRNGKey(9)
    fp = jax.random.normal(k, (N, 3))
    lp = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
    ln = _rand_dirs(jax.random.fold_in(k, 2), N, up=False)
    la = jax.random.uniform(jax.random.fold_in(k, 3), (N,)) + 0.1
    np.testing.assert_allclose(
        lm.nee_pdfT(scene, fp.T, lp.T, ln.T, la),
        common.nee_pdf(scene, fp, lp, ln, la), rtol=1e-4, atol=1e-4)
