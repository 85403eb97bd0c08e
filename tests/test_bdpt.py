import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.models import bdpt, naive, unidirectional
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng

W = 12


@pytest.fixture(scope="module")
def setup():
    # dim light so the reference's MAX_FIREFLY_LUM=5 clamp (util.cuh:31)
    # stays inactive and cross-integrator comparisons are unbiased
    mesh = builtin.cornell_box(light_scale=1.6, light_emission=(3.0, 3.0, 3.0))
    builtin.box(mesh, (-0.30, -0.5, -0.25), (-0.05, 0.1, 0.0), 2)
    builtin.box(mesh, (0.05, -0.5, 0.05), (0.30, -0.2, 0.30), 2)
    scene, _ = build_scene(mesh, builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), W, W, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(W))
    return scene, cam, px.ravel(), py.ravel()


def rend(setup, fn, spp, **kw):
    scene, cam, px, py = setup
    key = rng.base_key()
    acc = np.zeros((W * W, 3), np.float32)
    for s in range(spp):
        li, _ = fn(scene, cam, key, s, px, py, **kw)
        acc += np.asarray(li)
    return acc / spp


def test_bdpt_naive_strategy_matches_pt(setup):
    """s=0 alone, unweighted == naive PT (strategy-isolation invariant,
    SURVEY.md §4). eye_depth counts the camera vertex, hence D+1."""
    cfg = bdpt.BDPTConfig(eye_depth=7, light_depth=1, light_trace=False,
                          nee=False, connection=False, naive=True,
                          do_mis=False)
    b = rend(setup, bdpt.render_sample, 256, cfg=cfg)
    n = rend(setup, naive.render_sample, 256, max_depth=6)
    assert abs(b.mean() - n.mean()) / n.mean() < 0.08


def test_bdpt_full_agrees_with_unidirectional(setup):
    cfg = bdpt.BDPTConfig(eye_depth=7, light_depth=5)
    b = rend(setup, bdpt.render_sample, 96, cfg=cfg)
    u = rend(setup, unidirectional.render_sample, 192, max_depth=8)
    # the reference's light-trace splat estimator brightens grazing direct
    # views (box-filter splat at We(point)); allow its few-% bias
    assert abs(b.mean() - u.mean()) / u.mean() < 0.18
    assert np.isfinite(b).all() and (b >= 0).all()


def test_bdpt_weight_sum_reasonable(setup):
    """BDPT_PAINTWEIGHT renders sum-of-MIS-weights; for every sampled path
    class the weights over strategies partition unity, so the painted image
    must stay bounded by the number of contributing path lengths and be
    strictly positive where anything was sampled (deviceCode.cu:22 mode)."""
    cfg = bdpt.BDPTConfig(eye_depth=6, light_depth=4, paint_weight=True)
    img = rend(setup, bdpt.render_sample, 48, cfg=cfg)
    assert np.isfinite(img).all()
    # every (t,s) strategy contributes a weight in [0,1]; splats add weights
    # from other pixels' light paths, so bound by total strategy count
    assert img.max() <= 6 * (4 + 2)
    assert (img.mean(axis=-1) > 0).mean() > 0.9


def test_bdpt_reproducible(setup):
    cfg = bdpt.BDPTConfig(eye_depth=5, light_depth=3)
    a = rend(setup, bdpt.render_sample, 2, cfg=cfg)
    b = rend(setup, bdpt.render_sample, 2, cfg=cfg)
    np.testing.assert_array_equal(a, b)
