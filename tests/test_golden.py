"""Golden regression tests (SURVEY.md §4 test pyramid, level 3): fixed-seed
renders compared by RMSE against stored outputs — the framework's version of
the reference's saveImageCSV_MONO numeric-diff workflow (imageUtil.cu:123)."""

import os

import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu.models import unidirectional
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng
from cudapathtracer_tpu.utils.image import rmse

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "cornell_uni_16x16_8spp.npy")


def test_golden_cornell_unidirectional():
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 16, 16, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(16))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    acc = np.zeros((256, 3), np.float32)
    for s in range(8):
        li, _ = unidirectional.render_sample(scene, cam, key, s, px, py,
                                             max_depth=6)
        acc += np.asarray(li)
    img = acc / 8
    golden = np.load(GOLDEN)
    # Threefry keying is bit-stable; allow only accumulation-order noise
    assert rmse(img, golden) < 1e-4, \
        f"golden drift: rmse={rmse(img, golden):.2e}"
