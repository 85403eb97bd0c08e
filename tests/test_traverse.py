import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.ops import intersect, traverse
from cudapathtracer_tpu.scene.builtin import cornell_with_blocks, cornell_with_spheres
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def scene():
    # reference-parity oracle tests run on the single-reference build
    # (test_sbvh_matches_brute_force covers the SBVH default)
    sc, _ = build_scene(cornell_with_blocks(), builtin_materials(),
                        use_sbvh=False)
    return sc


def rand_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-0.45, 0.45, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_matches_brute_force(scene):
    """The reference's own oracle (sceneIntersection,
    integratorUtilities.cuh:290-335): BVH closest hit == O(T) closest hit."""
    o, d = rand_rays(512)
    hit = traverse.closest_hit(scene, o, d)
    bt, btri, bu, bv = intersect.brute_force_closest_hit(
        o, d, scene.tri_v0, scene.tri_e1, scene.tri_e2)
    ht, bt_, bb = np.asarray(hit.tri), np.asarray(bt), np.asarray(btri)
    # same hit/miss classification; where the triangle differs it must be a
    # tie (edge shared by two triangles) at identical distance
    np.testing.assert_array_equal(ht >= 0, bb >= 0)
    m = ht >= 0
    np.testing.assert_allclose(np.asarray(hit.t)[m], bt_[m], rtol=1e-5)
    same = m & (ht == bb)
    np.testing.assert_allclose(np.asarray(hit.u)[same], np.asarray(bu)[same],
                               atol=1e-5)
    assert same.sum() >= 0.9 * m.sum()


def test_bvh_matches_brute_force_spheres():
    sc, _ = build_scene(cornell_with_spheres(), builtin_materials(),
                        use_sbvh=False)
    o, d = rand_rays(256, 7)
    hit = traverse.closest_hit(sc, o, d)
    bt, btri, _, _ = intersect.brute_force_closest_hit(
        o, d, sc.tri_v0, sc.tri_e1, sc.tri_e2)
    ht, bb = np.asarray(hit.tri), np.asarray(btri)
    np.testing.assert_array_equal(ht >= 0, bb >= 0)
    m = ht >= 0
    np.testing.assert_allclose(np.asarray(hit.t)[m], np.asarray(bt)[m],
                               rtol=1e-5)


def test_max_t_respected(scene):
    o, d = rand_rays(256, 1)
    full = traverse.closest_hit(scene, o, d)
    m = np.asarray(full.tri) >= 0
    short_t = np.asarray(full.t) * 0.5
    near = traverse.closest_hit(scene, o, d, max_t=jnp.asarray(short_t))
    # closest hit is beyond max_t for every lane -> all miss
    assert (np.asarray(near.tri)[m] == -1).all()


def test_skip_tri(scene):
    o, d = rand_rays(256, 2)
    hit = traverse.closest_hit(scene, o, d)
    hit2 = traverse.closest_hit(scene, o, d, skip_tri=hit.tri)
    m = np.asarray(hit.tri) >= 0
    assert (np.asarray(hit2.tri)[m] != np.asarray(hit.tri)[m]).all()


def test_shadow_blocked_and_clear(scene):
    # ray from inside box toward the light: clear until a block intervenes;
    # verify against brute force: occluded iff any non-leaf hit within max_t
    o, d = rand_rays(512, 3)
    max_t = jnp.full((512,), 0.7)
    scale = traverse.shadow_factor(scene, o, d, max_t)
    bt, btri, _, _ = intersect.brute_force_closest_hit(
        o, d, scene.tri_v0, scene.tri_e1, scene.tri_e2)
    occluded_bf = (np.asarray(btri) >= 0) & (np.asarray(bt) < 0.7)
    got = np.asarray(jnp.max(scale, axis=-1)) == 0.0
    np.testing.assert_array_equal(got, occluded_bf)


def test_backface_flip(scene):
    # straight down at the floor from inside: normal must point up
    n = 8
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (n, 1))
    hit = traverse.closest_hit(scene, o, d)
    info = traverse.interpolate_hit(scene, o, d, hit)
    assert bool(hit.valid.all())
    nrm = np.asarray(info["normal"])
    assert (nrm[:, 1] > 0.99).all()
    assert not np.asarray(info["backface"]).any()


def test_shade_data_matches_interpolate_hit():
    """The packed single-gather shade row must reproduce interpolate_hit +
    MaterialTable.gather exactly."""
    import numpy as np
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    import dataclasses

    mesh = builtin.cornell_with_spheres()
    sc, _ = build_scene(mesh, builtin_materials())
    rs = np.random.RandomState(3)
    n = 512
    o = jnp.asarray(rs.uniform(-0.4, 0.4, (n, 3)).astype(np.float32))
    d = jnp.asarray(rs.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = traverse.closest_hit(sc, o, d)

    info, mat = traverse.shade_data(sc, o, d, hit)
    ref = traverse.interpolate_hit(sc, o, d, hit)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(info[k]), np.asarray(ref[k]),
                                      err_msg=k)
    ref_mat = sc.materials.gather(jnp.maximum(hit.tri, 0) * 0
                                  + ref["mat_id"])
    for f in dataclasses.fields(type(mat)):
        np.testing.assert_array_equal(np.asarray(getattr(mat, f.name)),
                                      np.asarray(getattr(ref_mat, f.name)),
                                      err_msg=f.name)


def test_sbvh_matches_brute_force(monkeypatch):
    """SBVH-built scene (TPT_BVH_SBVH=1): closest hit over duplicated
    clipped references equals the O(T) oracle — same hit/miss, same
    distance (duplicate refs of one triangle tie exactly)."""
    monkeypatch.setenv("TPT_BVH_SBVH", "1")
    sc, host_bvh = build_scene(cornell_with_blocks(), builtin_materials())
    assert host_bvh.perm.size > len(set())  # built
    o, d = rand_rays(512, seed=11)
    hit = traverse.closest_hit(sc, o, d)
    bt, btri, bu, bv = intersect.brute_force_closest_hit(
        o, d, sc.tri_v0, sc.tri_e1, sc.tri_e2)
    ht, bt_, bb = np.asarray(hit.tri), np.asarray(bt), np.asarray(btri)
    np.testing.assert_array_equal(ht >= 0, bb >= 0)
    m = ht >= 0
    np.testing.assert_allclose(np.asarray(hit.t)[m], bt_[m], rtol=1e-5)
    # against a non-SBVH build of the same mesh: identical hit distances
    monkeypatch.setenv("TPT_BVH_SBVH", "0")
    sc0, _ = build_scene(cornell_with_blocks(), builtin_materials())
    h0 = traverse.closest_hit(sc0, o, d)
    np.testing.assert_array_equal(ht >= 0, np.asarray(h0.tri) >= 0)
    np.testing.assert_allclose(np.asarray(hit.t)[m], np.asarray(h0.t)[m],
                               rtol=1e-5)
