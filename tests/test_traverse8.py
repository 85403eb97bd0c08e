"""BVH8 engine tests: equivalence with the threaded-binary engine (which is
itself validated against the brute-force oracle) across scene types."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.ops import traverse
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene


def rand_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-0.45, 0.45, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("mesh_fn", [builtin.cornell_with_blocks,
                                     builtin.cornell_with_spheres])
def test_bvh8_matches_threaded(mesh_fn):
    mesh = mesh_fn()
    mats = builtin_materials()
    sc8, _ = build_scene(mesh, mats, traversal="bvh8")
    scb, _ = build_scene(mesh, mats, traversal="threaded")
    o, d = rand_rays(512, 3)

    h8 = traverse.closest_hit(sc8, o, d)
    hb = traverse.closest_hit(scb, o, d)
    np.testing.assert_array_equal(np.asarray(h8.tri) >= 0,
                                  np.asarray(hb.tri) >= 0)
    m = np.asarray(h8.tri) >= 0
    np.testing.assert_allclose(np.asarray(h8.t)[m], np.asarray(hb.t)[m],
                               rtol=1e-5)

    s8 = traverse.shadow_factor(sc8, o, d, 0.6)
    sb = traverse.shadow_factor(scb, o, d, 0.6)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(sb), atol=1e-5)


def test_bvh8_max_t_and_skip():
    sc, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials(),
                        traversal="bvh8")
    o, d = rand_rays(256, 5)
    full = traverse.closest_hit(sc, o, d)
    m = np.asarray(full.tri) >= 0
    near = traverse.closest_hit(sc, o, d,
                                max_t=jnp.asarray(np.asarray(full.t) * 0.5))
    assert (np.asarray(near.tri)[m] == -1).all()
    skip = traverse.closest_hit(sc, o, d, skip_tri=full.tri)
    assert (np.asarray(skip.tri)[m] != np.asarray(full.tri)[m]).all()


def test_bvh8_leaf_material_transmission():
    """Shadow rays through a MAT_LEAF surface scale rather than block."""
    from cudapathtracer_tpu.utils.obj import MeshData
    from cudapathtracer_tpu.scene.materials import Material
    m = MeshData()
    builtin.quad(m, (-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1), 1)
    mats = [Material.air(), Material.leaf(transmission=0.5,
                                          albedo=(1.0, 1.0, 1.0))]
    sc, _ = build_scene(m, mats, traversal="bvh8")
    assert sc.has_leaf_materials
    n = 4
    o = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (n, 1))
    scale = np.asarray(traverse.shadow_factor(sc, o, d, 2.0))
    assert (scale > 0).all() and (scale < 1).all()  # attenuated, not blocked


@pytest.mark.parametrize("mesh_fn", [builtin.cornell_with_blocks,
                                     builtin.cornell_with_spheres])
def test_fused_matches_separate(mesh_fn):
    """trace_fused8 with interleaved closest/shadow lanes reproduces the
    dedicated closest_hit8 / shadow_factor8 engines exactly."""
    from cudapathtracer_tpu.ops.intersect import BIG_T

    mesh = mesh_fn()
    sc, _ = build_scene(mesh, builtin_materials(), traversal="bvh8")
    o, d = rand_rays(512, 7)
    is_shadow = jnp.asarray(np.random.RandomState(8).rand(512) < 0.5)
    t_lim = jnp.where(is_shadow, 0.6, BIG_T)
    active = jnp.asarray(np.random.RandomState(9).rand(512) < 0.9)

    hit_f, scale_f = traverse.trace_fused(sc, o, d, t_lim, is_shadow,
                                          active=active)
    hit_s = traverse.closest_hit(sc, o, d, active=active & ~is_shadow)
    scale_s = traverse.shadow_factor(sc, o, d, 0.6,
                                     active=active & is_shadow)

    mc = np.asarray(active & ~is_shadow)
    np.testing.assert_array_equal(np.asarray(hit_f.tri)[mc],
                                  np.asarray(hit_s.tri)[mc])
    np.testing.assert_allclose(np.asarray(hit_f.t)[mc],
                               np.asarray(hit_s.t)[mc], rtol=1e-6)
    ms = np.asarray(active & is_shadow)
    np.testing.assert_allclose(np.asarray(scale_f)[ms],
                               np.asarray(scale_s)[ms], atol=1e-6)
