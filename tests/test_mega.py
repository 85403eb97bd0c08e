"""Mega-wavefront unidirectional integrator (models/unidirectional_mega.py):
statistical agreement with the classic integrator and schedule invariance."""

import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu.models import unidirectional, unidirectional_mega
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng


def _accumulate(mod, scene, cam, px, py, spp, **kw):
    key = rng.base_key()
    acc = np.zeros((px.shape[0], 3), np.float32)
    for s in range(spp):
        li, _ = mod.render_sample(scene, cam, key, s, px, py, **kw)
        acc += np.asarray(li)
    return acc / spp


def test_mega_matches_classic_statistically():
    """Same estimator, different valid noise realization: the two
    integrators' mean images must agree within Monte-Carlo noise."""
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 12, 12, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(12), jnp.arange(12))
    px, py = px.ravel(), py.ravel()

    a = _accumulate(unidirectional_mega, scene, cam, px, py, 24,
                    max_depth=5, width=96, steps_per_iter=2)
    b = _accumulate(unidirectional, scene, cam, px, py, 24, max_depth=5)
    assert np.isfinite(a).all() and (a >= 0).all()
    # global energy agreement is much tighter than per-pixel noise
    assert abs(a.mean() - b.mean()) / b.mean() < 0.05
    # self-calibrating per-pixel check: mega-vs-classic must not exceed the
    # classic-vs-classic noise floor at the same spp (x1.3 slack)
    key = rng.base_key()
    c = np.zeros_like(b)
    for s in range(100, 124):
        li, _ = unidirectional.render_sample(scene, cam, key, s, px, py,
                                             max_depth=5)
        c += np.asarray(li)
    c /= 24
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    noise = float(np.sqrt(((c - b) ** 2).mean()))
    assert rmse < noise * 1.3, (rmse, noise)


def test_mega_schedule_invariance():
    """The image must not depend on the wavefront width / lane scheduling
    Sampling decisions are bit-identical (same keyed draws — checked via
    the exact ray-count match); radiance is allowed small float drift: XLA
    reassociates multiply chains differently per static width (~100s of
    ulps over deep specular paths)."""
    scene, _ = build_scene(builtin.cornell_with_spheres(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 8, 8, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    l1, r1 = unidirectional_mega.render_sample(scene, cam, key, 5, px, py,
                                               max_depth=6, width=64, steps_per_iter=2)
    l2, r2 = unidirectional_mega.render_sample(scene, cam, key, 5, px, py,
                                               max_depth=6, width=13, steps_per_iter=3)
    assert int(r1) == int(r2)
    a, b = np.asarray(l1), np.asarray(l2)
    np.testing.assert_allclose(a, b, atol=5e-3)
    assert (np.abs(a - b) < 1e-5).mean() > 0.9


def test_mega_retire_modes_bit_identical():
    """The windowed slot sweep (retire="window") and the scatter flush
    (retire="scatter") write the same values for every finished path as
    the full [K,W] sweep — only the write schedule differs. Images and
    ray counts must match the default exactly (bit-identical for window:
    same slots, same RGB9E5 packing; scatter sums in a different order
    so it gets allclose)."""
    scene, _ = build_scene(builtin.cornell_with_spheres(),
                           builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 12, 12, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(12), jnp.arange(12))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    kw = dict(max_depth=6, width=24, steps_per_iter=2, mini_splits=1)
    base, rb = unidirectional_mega.render_sample(
        scene, cam, key, 2, px, py, retire="slots", **kw)
    win, rw = unidirectional_mega.render_sample(
        scene, cam, key, 2, px, py, retire="window", **kw)
    sca, rs = unidirectional_mega.render_sample(
        scene, cam, key, 2, px, py, retire="scatter", **kw)
    assert int(rb) == int(rw) == int(rs)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(win))
    # scatter flushes float li directly (no RGB9E5 slot packing), so it
    # differs from the quantized modes by the 9-bit-mantissa quantum
    # (shared-exponent: a dim channel's quantum is 2^-9 of the bright
    # channel, so dim channels see large RELATIVE steps)
    np.testing.assert_allclose(np.asarray(base), np.asarray(sca),
                               rtol=5e-3, atol=5e-3)


def test_mega_early_nee_overlap_invariant():
    """mini_splits > 1 fires the early-NEE overlap (the mini launches a
    drained closest lane's NEE shadow before the shade). The image and
    ray counts must match the no-mini schedule exactly — the draws are
    counter-keyed and the shade recomputes the identical light sample.
    The specular-spheres scene exercises the speculative-cancel path
    (early launches on specular hits are canceled at shade)."""
    for mesh in (builtin.cornell_with_blocks(), builtin.cornell_with_spheres()):
        scene, _ = build_scene(mesh, builtin_materials())
        cam = Camera.pinhole((0.0, 0.0, 1.0), 8, 8, 0.0, 0.0, 0.0, 60.0)
        px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
        px, py = px.ravel(), py.ravel()
        key = rng.base_key()
        l1, r1 = unidirectional_mega.render_sample(
            scene, cam, key, 2, px, py, max_depth=6, width=40,
            steps_per_iter=4, mini_splits=4, early_nee=True)
        l2, r2 = unidirectional_mega.render_sample(
            scene, cam, key, 2, px, py, max_depth=6, width=40,
            steps_per_iter=4, mini_splits=1)
        assert int(r1) == int(r2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=5e-3)
        assert (np.abs(np.asarray(l1) - np.asarray(l2)) < 1e-5).mean() > 0.9


def test_mega_two_stage_tail_matches_single_stage(monkeypatch):
    """The narrow tail stage re-renders straggler pixels from scratch; the
    pixel-keyed RNG makes the replay exact, so image AND ray counts must
    match the single-stage machine."""
    scene, _ = build_scene(builtin.cornell_with_spheres(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 8, 8, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    monkeypatch.setenv("TPT_MEGA_TAIL_W", "8")
    l1, r1 = unidirectional_mega.render_sample(scene, cam, key, 3, px, py,
                                               max_depth=6, width=40)
    monkeypatch.setenv("TPT_MEGA_TAIL_W", "0")
    # a different static width forces a fresh trace (the env is read at
    # trace time); the image is width-invariant by construction
    l2, r2 = unidirectional_mega.render_sample(scene, cam, key, 3, px, py,
                                               max_depth=6, width=41)
    assert int(r1) == int(r2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=5e-3)


def test_mega_no_mis_mode():
    """use_mis=False must run (naive-with-RR estimator) and stay finite."""
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 8, 8, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    li, _ = unidirectional_mega.render_sample(scene, cam, key, 0, px, py,
                                              max_depth=5, width=32,
                                              use_mis=False,
                                              steps_per_iter=2)
    a = np.asarray(li)
    assert np.isfinite(a).all() and (a >= 0).all() and a.mean() > 0.01


def test_mega_grid_w_bit_identical():
    """grid_w (arithmetic pixel coords + identity queue, no frame-table
    gathers in the transition) must be BIT-identical to the gather path —
    same floats, same RNG ids. Frame chosen so width does not divide the
    pixel count (exercises queue-pad clamping)."""
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    w, h = 12, 7
    cam = Camera.pinhole((0.0, 0.0, 1.0), w, h, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    a, ra = unidirectional_mega.render_sample(scene, cam, key, 0, px, py,
                                              max_depth=5, width=32)
    b, rb = unidirectional_mega.render_sample(scene, cam, key, 0, px, py,
                                              max_depth=5, width=32,
                                              grid_w=w)
    assert int(ra) == int(rb)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bdpt_mega_grid_w_bit_identical():
    from cudapathtracer_tpu.models import bdpt, bdpt_mega

    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    w, h = 12, 7
    cam = Camera.pinhole((0.0, 0.0, 1.0), w, h, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    cfg = bdpt.BDPTConfig(eye_depth=3, light_depth=2)
    a, ra = bdpt_mega.render_sample(scene, cam, key, 0, px, py, cfg=cfg,
                                    width=32)
    b, rb = bdpt_mega.render_sample(scene, cam, key, 0, px, py, cfg=cfg,
                                    width=32, grid_w=w)
    assert int(ra) == int(rb)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
