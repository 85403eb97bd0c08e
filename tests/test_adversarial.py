"""Adversarial numeric sweeps (ROADMAP quality item 10): grazing angles,
degenerate UVs, extreme scene scales, near-TIR dielectrics. The reference's
analogous guard is the NaN=magenta / Inf=green pixel sentinel scrub
(main.cu:864-869, integratorUtilities.cuh:357-365); here the invariants are
asserted directly on the numeric outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.models import unidirectional
from cudapathtracer_tpu.ops import bsdf as bsdf_ops
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import (Material, builtin_materials,
                                                build_table)
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng
from cudapathtracer_tpu.utils.obj import MeshData


def _finite(*arrays):
    for a in arrays:
        assert np.isfinite(np.asarray(a)).all()


def _rows(mats, n):
    table = build_table(mats)
    return table.gather(jnp.zeros((n,), jnp.int32))


GRAZE = [1e-7, 1e-4, 1e-2]


@pytest.mark.parametrize("z", GRAZE)
def test_ggx_grazing_angles(z):
    """GGX metal f/pdf/sample stay finite when wi approaches the horizon
    (reference lobes: reflectors.cuh:78-180)."""
    n = 4
    mat = _rows([Material.metal((0.14, 0.16, 0.13), (0.14, 0.16, 0.13),
                                0.1)], n)
    s = np.sqrt(max(1.0 - z * z, 0.0))
    wi = jnp.broadcast_to(jnp.asarray([s, 0.0, z], jnp.float32), (n, 3))
    wo = jnp.broadcast_to(jnp.asarray([-s * 0.5, 0.5, z], jnp.float32),
                          (n, 3))
    alb = jnp.ones((n, 3), jnp.float32)
    f = bsdf_ops.bsdf_f(mat, alb, wi, wo, jnp.ones((n,)))
    pdf = bsdf_ops.bsdf_pdf(mat, wi, wo, jnp.ones((n,)))
    key = rng.base_key()
    ids = jnp.arange(n, dtype=jnp.int32)
    wo_s, f_s, pdf_s = bsdf_ops.bsdf_sample(
        key, 0, mat, alb, wi, jnp.zeros((n,), bool), jnp.ones((n,)),
        ids=ids)
    _finite(f, pdf, wo_s, f_s, pdf_s)


@pytest.mark.parametrize("z", GRAZE)
def test_leaf_grazing_angles(z):
    """Layered leaf BSDF (reflectors.cuh:420-543) at grazing incidence."""
    n = 4
    mat = _rows([Material.leaf(ior=1.4, roughness=0.3,
                               albedo=(0.2, 0.5, 0.1), transmission=0.4)], n)
    s = np.sqrt(max(1.0 - z * z, 0.0))
    wi = jnp.broadcast_to(jnp.asarray([s, 0.0, z], jnp.float32), (n, 3))
    wo = jnp.broadcast_to(jnp.asarray([0.0, s, -z], jnp.float32), (n, 3))
    alb = jnp.full((n, 3), 0.3, jnp.float32)
    f = bsdf_ops.bsdf_f(mat, alb, wi, wo, jnp.ones((n,)))
    pdf = bsdf_ops.bsdf_pdf(mat, wi, wo, jnp.ones((n,)))
    key = rng.base_key()
    ids = jnp.arange(n, dtype=jnp.int32)
    wo_s, f_s, pdf_s = bsdf_ops.bsdf_sample(
        key, 0, mat, alb, wi, jnp.zeros((n,), bool), jnp.ones((n,)),
        ids=ids)
    _finite(f, pdf, wo_s, f_s, pdf_s)


def test_dielectric_near_tir():
    """Smooth dielectric exactly at / just inside the TIR cone
    (reflectors.cuh:304-369): sampling must stay finite and energy-bounded."""
    n = 8
    ior = 1.5
    # critical angle from the dense side: sin(theta_c) = 1/ior
    zc = np.sqrt(1.0 - 1.0 / ior ** 2)
    mat = _rows([Material.smooth_dielectric(ior, (0.0, 0.0, 0.0), 1)], n)
    alb = jnp.ones((n, 3), jnp.float32)
    key = rng.base_key()
    ids = jnp.arange(n, dtype=jnp.int32)
    for dz in (1e-6, -1e-6, 0.0):
        z = float(np.clip(zc + dz, 1e-6, 1.0))
        s = np.sqrt(max(1.0 - z * z, 0.0))
        wi = jnp.broadcast_to(jnp.asarray([s, 0.0, z], jnp.float32), (n, 3))
        # backface=True: leaving the dense medium (etaI=ior -> etaT=1)
        wo_s, f_s, pdf_s = bsdf_ops.bsdf_sample(
            key, 0, mat, alb, wi, jnp.ones((n,), bool), jnp.full((n,), ior),
            ids=ids)
        _finite(wo_s, f_s, pdf_s)
        assert float(jnp.abs(jnp.linalg.norm(wo_s, axis=-1) - 1.0).max()) < 1e-4


def test_degenerate_uv_texture_lookup():
    """Texture fetch with uv = 0, 1, negative and >1 (wrap addressing,
    reflectors.cuh:371-417) stays in-bounds and finite."""
    tex = jnp.asarray(np.random.default_rng(0).random((16, 3)),
                      jnp.float32)
    uv = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [-0.25, 2.75],
                      [1e6, -1e6], [0.5, 0.5]], jnp.float32)
    n = uv.shape[0]
    out = bsdf_ops.sample_texture(tex, jnp.zeros((n,), jnp.int32),
                                  jnp.full((n,), 4, jnp.int32),
                                  jnp.full((n,), 4, jnp.int32), uv)
    _finite(out)


@pytest.mark.parametrize("scale", [1e-3, 1e3])
def test_scene_scale_extremes(scale):
    """The whole pipeline (BVH build, traversal epsilons, NEE geometry
    terms) renders finite at millimeter and kilometer scene scales."""
    mesh = builtin.cornell_with_blocks()
    mesh.positions = (np.asarray(mesh.positions) * scale).astype(np.float32)
    scene, _ = build_scene(mesh, builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0 * scale), 8, 8, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
    li, rays = unidirectional.render_sample(
        scene, cam, rng.base_key(), 0, px.ravel(), py.ravel(), max_depth=4)
    img = np.asarray(li)
    _finite(img)
    assert (img >= 0.0).all()
    assert img.max() > 0.0  # the light is visible, not a black frame


def test_huge_emission_firefly_path():
    """A 1e6-luminance light must not NaN the MIS weights (power-2 weight
    ratios, deviceCode.cu:449-450)."""
    mesh = builtin.cornell_box(light_scale=1e6)
    scene, _ = build_scene(mesh, builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 8, 8, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
    li, _ = unidirectional.render_sample(
        scene, cam, rng.base_key(), 0, px.ravel(), py.ravel(), max_depth=4)
    _finite(li)
