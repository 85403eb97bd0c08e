"""Wavefront-layout independence of sampling (utils/rng.py *_id streams).

The reference's per-thread curand state ties every pixel's random sequence
to its thread id (deviceCode.cu:53-61); here draws are keyed by stable
pixel ids, so the SAME pixel renders bit-identically no matter how the
wavefront is chunked, compacted, or sharded."""

import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu.models import naive, unidirectional
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng


def _render(mod, scene, cam, px, py, **kw):
    key = rng.base_key()
    li, _ = mod.render_sample(scene, cam, key, 3, px, py, **kw)
    return np.asarray(li)


def test_chunking_invariance_unidirectional():
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 16, 16, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(16))
    px, py = px.ravel(), py.ravel()

    whole = _render(unidirectional, scene, cam, px, py, max_depth=5)
    halves = np.concatenate([
        _render(unidirectional, scene, cam, px[:128], py[:128], max_depth=5),
        _render(unidirectional, scene, cam, px[128:], py[128:], max_depth=5)])
    np.testing.assert_array_equal(whole, halves)

    # a permuted wavefront produces the permuted image
    perm = np.random.RandomState(0).permutation(256)
    scrambled = _render(unidirectional, scene, cam, px[perm], py[perm],
                        max_depth=5)
    np.testing.assert_array_equal(whole[perm], scrambled)


def test_chunking_invariance_naive():
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 8, 8, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
    px, py = px.ravel(), py.ravel()
    whole = _render(naive, scene, cam, px, py, max_depth=4)
    parts = np.concatenate([
        _render(naive, scene, cam, px[:20], py[:20], max_depth=4),
        _render(naive, scene, cam, px[20:], py[20:], max_depth=4)])
    np.testing.assert_array_equal(whole, parts)


def test_bounce_compaction_invariance():
    """Bounce-level straggler compaction must not change the image (it is
    keyed-RNG transparent)."""
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), 16, 16, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(16))
    px, py = px.ravel(), py.ravel()
    plain = _render(unidirectional, scene, cam, px, py, max_depth=5)
    compacted = _render(unidirectional, scene, cam, px, py, max_depth=5,
                        compact_min_width=32)
    np.testing.assert_array_equal(plain, compacted)
