import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.utils import math as vm
from cudapathtracer_tpu.utils import packing

pytestmark = pytest.mark.smoke


def rand_unit(n, seed=0):
    r = np.random.RandomState(seed).normal(size=(n, 3))
    return (r / np.linalg.norm(r, axis=1, keepdims=True)).astype(np.float32)


def test_frame_orthonormal():
    n = jnp.asarray(rand_unit(256))
    t, b = vm.build_frame(n)
    np.testing.assert_allclose(vm.dot(t, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(b, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(t, b), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.length(t), 1.0, atol=1e-5)
    np.testing.assert_allclose(vm.length(b), 1.0, atol=1e-5)


def test_local_world_roundtrip():
    n = jnp.asarray(rand_unit(128, 1))
    v = jnp.asarray(rand_unit(128, 2))
    np.testing.assert_allclose(vm.to_world(vm.to_local(v, n), n), v,
                               atol=1e-5)
    # z of local = cos angle with normal
    np.testing.assert_allclose(vm.to_local(v, n)[:, 2], vm.dot(v, n),
                               atol=1e-5)


def test_reflect_refract():
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    wi = vm.normalize(jnp.asarray([[1.0, 0.0, 1.0]] * 4))
    r = vm.reflect(wi, n)
    np.testing.assert_allclose(vm.dot(r, n), vm.dot(wi, n), atol=1e-6)
    wt, tir = vm.refract(wi, n, jnp.full((4,), 1.0 / 1.5))
    assert not bool(tir.any())
    # Snell: sin_t = eta * sin_i
    sin_i = jnp.sqrt(1 - vm.dot(wi, n) ** 2)
    sin_t = jnp.sqrt(1 - vm.dot(wt, n) ** 2)
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)


def test_oct_roundtrip():
    n = rand_unit(4096, 3)
    dec = np.asarray(packing.unpack_oct(packing.pack_oct(jnp.asarray(n))))
    dots = (dec * n).sum(-1)
    assert dots.min() > 0.99999  # snorm16 oct is accurate to ~1e-4 rad


def test_rgb9e5_roundtrip():
    c = np.abs(np.random.RandomState(0).normal(size=(1024, 3))).astype(np.float32) * 10
    dec = np.asarray(packing.unpack_rgb9e5(packing.pack_rgb9e5(jnp.asarray(c))))
    # shared-exponent codec: absolute error bounded by max_component / 2^9
    # per pixel (smaller components share the larger one's exponent)
    step = c.max(axis=-1, keepdims=True) / 512.0
    assert (np.abs(dec - c) <= step + 1e-6).all()


def test_flags_roundtrip():
    rs = np.random.RandomState(0)
    delta = jnp.asarray(rs.rand(100) > 0.5)
    back = jnp.asarray(rs.rand(100) > 0.5)
    light = jnp.asarray(rs.randint(-1, 1000, 100), jnp.int32)
    mat = jnp.asarray(rs.randint(0, 1024, 100), jnp.int32)
    d, b, l, m = packing.unpack_flags(packing.pack_flags(delta, back, light, mat))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(delta))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(back))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(light))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mat))


def test_merge_radius_schedule():
    # r_i = r0 * sqrt((1/(i+1))^alpha) (util.cuh:415-418)
    r = vm.merge_radius(2.0, jnp.asarray([0.0, 1.0, 3.0]), 0.7)
    np.testing.assert_allclose(
        np.asarray(r),
        2.0 * np.sqrt((1.0 / np.array([1.0, 2.0, 4.0])) ** 0.7), rtol=1e-5)


def test_next_prime():
    assert vm.next_prime(10) == 11
    assert vm.next_prime(11) == 11
    assert vm.next_prime(90) == 97


def test_raw_threefry_matches_jax():
    """utils/rng's hand-vectorized Threefry-2x32 must equal JAX's own
    implementation of the same cipher (it IS jax's PRNG primitive)."""
    import numpy as np
    from cudapathtracer_tpu.utils import rng as R
    try:
        from jax._src.prng import threefry_2x32 as jref
    except ImportError:  # pragma: no cover - private API moved
        import pytest
        pytest.skip("jax private threefry not importable")
    ks = np.asarray([123456789, 987654321], np.uint32)
    xs = np.arange(64, dtype=np.uint32)
    ref = np.asarray(jref(jnp.asarray(ks), jnp.stack([xs, xs + 7]).ravel()))
    y0, y1 = R._threefry2x32(jnp.uint32(ks[0]), jnp.uint32(ks[1]),
                             jnp.asarray(xs), jnp.asarray(xs + 7))
    got = np.concatenate([np.asarray(y0), np.asarray(y1)])
    np.testing.assert_array_equal(got, ref)


def test_uniform_id_statistics():
    import numpy as np
    from cudapathtracer_tpu.utils import rng as R
    key = R.base_key()
    ids = jnp.arange(20000, dtype=jnp.int32)
    u = np.asarray(R.uniform_id(key, 3, ids))
    v = np.asarray(R.uniform_id(key, 4, ids))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01 and abs(v.mean() - 0.5) < 0.01
    assert abs(np.corrcoef(u, v)[0, 1]) < 0.02
