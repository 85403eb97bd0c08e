"""Persistent mega-BDPT (models/bdpt_mega.py) vs the classic scan BDPT."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.models import bdpt, bdpt_mega
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng

W = 12


@pytest.fixture(scope="module")
def setup():
    mesh = builtin.cornell_box(light_scale=1.6,
                               light_emission=(3.0, 3.0, 3.0))
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


def test_bdpt_mega_agrees_with_classic(setup):
    cfg = bdpt.BDPTConfig(eye_depth=5, light_depth=4)
    m = rend(setup, bdpt_mega.render_sample, 32, cfg=cfg)
    c = rend(setup, bdpt.render_sample, 32, cfg=cfg)
    assert np.isfinite(m).all() and (m >= 0).all()
    assert abs(m.mean() - c.mean()) / c.mean() < 0.12
    rel = np.abs(m.mean(-1) - c.mean(-1)) / (c.mean(-1) + 0.05)
    assert np.median(rel) < 0.35


def test_bdpt_mega_schedule_invariant(setup):
    scene, cam, px, py = setup
    key = rng.base_key()
    cfg = bdpt.BDPTConfig(eye_depth=4, light_depth=3)
    a, _ = bdpt_mega.render_sample(scene, cam, key, 0, px, py, cfg=cfg,
                                   steps_per_iter=2, mini_splits=1)
    b, _ = bdpt_mega.render_sample(scene, cam, key, 0, px, py, cfg=cfg,
                                   steps_per_iter=3, mini_splits=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_bdpt_mega_strategy_toggles_run(setup):
    scene, cam, px, py = setup
    key = rng.base_key()
    for cfg in (bdpt.BDPTConfig(eye_depth=4, light_depth=3, nee=False),
                bdpt.BDPTConfig(eye_depth=4, light_depth=3,
                                connection=False),
                bdpt.BDPTConfig(eye_depth=4, light_depth=3,
                                light_trace=False)):
        li, _ = bdpt_mega.render_sample(scene, cam, key, 0, px, py, cfg=cfg)
        a = np.asarray(li)
        assert np.isfinite(a).all() and (a >= 0).all()
