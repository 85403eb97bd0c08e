"""Persistent light-walk machine (models/light_mega.py) vs the classic
scan walk (models/paths.py).

The machine replays the classic walk's exact draw streams (per-lane
depth-keyed via rng.draw_key_table), so vertices agree per-path up to
lane-major float association; its own output is EXACTLY invariant to
schedule and width (pure function of the keyed streams)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.models import light_mega, paths
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.scene.materials import TRANSPORT_IMPORTANCE
from cudapathtracer_tpu.utils import rng

W = 16
C = W * W
DEPTH = 5


@pytest.fixture(scope="module")
def setup():
    mesh = builtin.cornell_box(light_scale=1.6,
                               light_emission=(3.0, 3.0, 3.0))
    builtin.box(mesh, (-0.30, -0.5, -0.25), (-0.05, 0.1, 0.0), 2)
    builtin.box(mesh, (0.05, -0.5, 0.05), (0.30, -0.2, 0.30), 2)
    scene, _ = build_scene(mesh, builtin_materials())
    px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(W))
    return scene, px.ravel(), py.ravel()


def classic(scene, key, pid_g, eta_vcm=None):
    start, _v0 = paths.start_light_walk(scene, key, C, ids=pid_g)
    fvm = (start.first_vc_scale / jnp.maximum(eta_vcm, 1e-30)
           if eta_vcm is not None else None)
    bufs, _esc, rays = paths.random_walk(
        scene, key, start, DEPTH, TRANSPORT_IMPORTANCE,
        eta_vcm=eta_vcm, first_vm_seed=fvm, ids=pid_g)
    return bufs, rays


def test_light_mega_matches_classic_walk(setup):
    scene, px, py = setup
    key = rng.sample_key(rng.base_key(), 3)
    pid_g = rng.pixel_ids(px, py)
    eta = jnp.float32(37.5)
    cb, crays = classic(scene, key, pid_g, eta_vcm=eta)
    mb, mrays = light_mega.light_walk_mega(
        scene, key, C, DEPTH, TRANSPORT_IMPORTANCE, eta_vcm=eta,
        grid_w=W, width=64, steps_per_iter=1, mini_splits=1)
    cv = np.asarray(cb.valid)
    mv = np.asarray(mb.valid)
    # identical draw streams -> identical path structure (rare edge-hit
    # divergence from lane-major float association would break a whole
    # path; none observed on this scene)
    np.testing.assert_array_equal(mv, cv)
    assert int(mrays) == int(crays)
    m = cv
    for name, rtol, atol in (("pt", 1e-5, 1e-6), ("beta", 1e-2, 1e-3),
                             ("pdf_fwd", 1e-4, 1e-8),
                             ("d_vcm", 1e-4, 1e-6), ("d_vc", 1e-4, 1e-6),
                             ("d_vm", 1e-4, 1e-6)):
        a = np.asarray(getattr(cb, name))[m]
        b = np.asarray(getattr(mb, name))[m]
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol,
                                   err_msg=name)
    np.testing.assert_array_equal(np.asarray(mb.mat_id)[m],
                                  np.asarray(cb.mat_id)[m])
    np.testing.assert_array_equal(np.asarray(mb.is_delta)[m],
                                  np.asarray(cb.is_delta)[m])
    np.testing.assert_array_equal(np.asarray(mb.light_ind)[m],
                                  np.asarray(cb.light_ind)[m])
    # oct-packed unit vectors: compare decoded directions
    for name in ("n", "wo"):
        a = np.asarray(getattr(cb, name))[m]
        b = np.asarray(getattr(mb, name))[m]
        assert (np.abs(a - b) < 1e-2).all(), name


def test_light_mega_schedule_and_width_invariant(setup):
    """The walk is a pure function of the (path, depth)-keyed streams:
    schedule/width change only lane assignment. Float fields are
    near-exact rather than bit-exact because different widths compile
    different programs and XLA reassociates fma chains per shape
    (observed: 2/3072 elements off by 1 ulp between w=64 and w=160)."""
    scene, px, py = setup
    key = rng.sample_key(rng.base_key(), 5)
    kw = dict(grid_w=W)
    a, ra = light_mega.light_walk_mega(
        scene, key, C, DEPTH, TRANSPORT_IMPORTANCE, eta_vcm=10.0,
        width=64, steps_per_iter=1, mini_splits=1, **kw)
    b, rb = light_mega.light_walk_mega(
        scene, key, C, DEPTH, TRANSPORT_IMPORTANCE, eta_vcm=10.0,
        width=160, steps_per_iter=3, mini_splits=1, **kw)
    assert int(ra) == int(rb)
    np.testing.assert_array_equal(np.asarray(a.valid),
                                  np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.flags),
                                  np.asarray(b.flags))
    m = np.asarray(a.valid)
    for f in ("pt", "pdf_fwd", "d_vcm", "d_vc", "d_vm"):
        np.testing.assert_allclose(np.asarray(getattr(b, f))[m],
                                   np.asarray(getattr(a, f))[m],
                                   rtol=1e-5, atol=1e-6, err_msg=f)
    for f in ("n", "wo", "beta"):
        av = np.asarray(getattr(a, f))[m]
        bv = np.asarray(getattr(b, f))[m]
        assert (np.abs(av - bv) < 1e-2).all(), f


def test_light_mega_bdpt_flavor_runs(setup):
    scene, px, py = setup
    key = rng.sample_key(rng.base_key(), 7)
    pid_g = rng.pixel_ids(px, py)
    cb, crays = classic(scene, key, pid_g, eta_vcm=None)
    mb, mrays = light_mega.light_walk_mega(
        scene, key, C, DEPTH, TRANSPORT_IMPORTANCE, eta_vcm=None,
        pxc=px, pyc=py, width=64, steps_per_iter=2, mini_splits=2)
    np.testing.assert_array_equal(np.asarray(mb.valid),
                                  np.asarray(cb.valid))
    assert int(mrays) == int(crays)
    m = np.asarray(cb.valid)
    np.testing.assert_allclose(np.asarray(mb.d_vc)[m],
                               np.asarray(cb.d_vc)[m], rtol=1e-4,
                               atol=1e-6)
    assert not np.asarray(mb.d_vm)[m].any()
