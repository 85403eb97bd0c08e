"""Environment (sky) light end-to-end: the reference ships sample_sky
disabled (integratorUtilities.cuh:437 returns black); this framework
revives it behind the SAMPLE_ENVIRONMENT config flag (utils/config.py:179,
driver.py:136-152). These tests pin the behavior: a ray that escapes the
scene picks up the gradient sky, identically across integrator engines
(camera jitter and path draws are keyed by pixel id, so on a scene where
every primary ray misses, classic / naive / mega must agree exactly)."""

import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu.models import naive, unidirectional, unidirectional_mega
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng
from cudapathtracer_tpu.utils.obj import MeshData

SIZE = 8


def _miss_scene():
    """One floor quad BEHIND the camera: every primary ray misses."""
    m = MeshData()
    pts = np.asarray([[-1, -1, 9], [1, -1, 9], [1, 1, 9], [-1, 1, 9]],
                     np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    m.add(pts, idx, 2)
    scene, _ = build_scene(m, builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), SIZE, SIZE, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(SIZE), jnp.arange(SIZE))
    return scene, cam, px.ravel(), py.ravel()


def test_env_off_is_black():
    scene, cam, px, py = _miss_scene()
    li, _ = unidirectional.render_sample(scene, cam, rng.base_key(), 0,
                                         px, py, max_depth=2)
    assert float(jnp.abs(li).max()) == 0.0


def test_env_on_all_integrators_agree_on_miss():
    scene, cam, px, py = _miss_scene()
    key = rng.base_key()
    li_u, _ = unidirectional.render_sample(
        scene, cam, key, 0, px, py, max_depth=2, sample_environment=True)
    li_n, _ = naive.render_sample(
        scene, cam, key, 0, px, py, max_depth=2, sample_environment=True)
    li_m, _ = unidirectional_mega.render_sample(
        scene, cam, key, 0, px, py, max_depth=2, sample_environment=True,
        width=16, grid_w=SIZE)
    a = np.asarray(li_u)
    assert np.isfinite(a).all() and (a.max(axis=-1) > 0).all()
    # depth-0 miss radiance IS sky(primary d): engine-independent
    np.testing.assert_allclose(a, np.asarray(li_n), atol=1e-6)
    # the mega engine retires through the RGB9E5 packed accumulator
    # (shared-exponent 9-bit mantissa): quantum <= 2^-9 at these values
    np.testing.assert_allclose(a, np.asarray(li_m), atol=2.5e-3)
    # gradient sky: zenith-leaning rows bluer than horizon-leaning rows
    # (py grows along +v = camera up, camera.py:94)
    img = a.reshape(SIZE, SIZE, 3)
    assert img[-1, :, 2].mean() > img[0, :, 2].mean()


def test_env_bdpt_vcm_escape():
    """BDPT/VCM env endpoints (EXCEEDS the reference, which leaves them
    unimplemented — deviceCode.cu:1541/1558/2386): an eye walk that escapes
    picks up the sky with MIS weight 1. BDPT and VCM share the eye-walk key
    stream (key_e + 2^20), so their miss-scene images are identical; the
    mega engines agree up to the RGB9E5 retirement quantum."""
    from cudapathtracer_tpu.models import bdpt, bdpt_mega, vcm, vcm_mega

    scene, cam, px, py = _miss_scene()
    key = rng.base_key()
    bcfg = bdpt.BDPTConfig(eye_depth=3, light_depth=2,
                           sample_environment=True)
    li_b, _ = bdpt.render_sample(scene, cam, key, 0, px, py, cfg=bcfg)
    a = np.asarray(li_b)
    assert np.isfinite(a).all() and (a.max(axis=-1) > 0).all()

    # off -> black (matches the reference's disabled sky)
    li_off, _ = bdpt.render_sample(
        scene, cam, key, 0, px, py,
        cfg=bdpt.BDPTConfig(eye_depth=3, light_depth=2))
    assert float(jnp.abs(li_off).max()) == 0.0

    vcfg = vcm.VCMConfig(eye_depth=3, light_depth=2,
                         sample_environment=True)
    li_v, _ = vcm.render_sample(scene, cam, key, 0, px, py, cfg=vcfg)
    np.testing.assert_allclose(a, np.asarray(li_v), atol=1e-6)

    li_bm, _ = bdpt_mega.render_sample(scene, cam, key, 0, px, py, cfg=bcfg,
                                       width=16, grid_w=SIZE)
    np.testing.assert_allclose(a, np.asarray(li_bm), atol=2.5e-3)

    li_vm, _ = vcm_mega.render_sample(scene, cam, key, 0, px, py, cfg=vcfg,
                                      width=16, grid_w=SIZE)
    np.testing.assert_allclose(np.asarray(li_v), np.asarray(li_vm),
                               atol=2.5e-3)
