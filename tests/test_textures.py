import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu.ops import bsdf as bsdf_ops
from cudapathtracer_tpu.scene import textures
from cudapathtracer_tpu.scene.builtin import checker_texture, cornell_box, quad
from cudapathtracer_tpu.scene.materials import (Material, build_table,
                                                builtin_materials)
from cudapathtracer_tpu.scene.scene import build_scene


def test_atlas_builder_windows():
    b = textures.AtlasBuilder()
    w1 = b.add_image(np.ones((4, 8, 3), np.float32))
    w2 = b.add_image(np.zeros((2, 2, 3), np.float32))
    assert w1 == (0, 8, 4)
    assert w2 == (32, 2, 2)
    atlas = b.build()
    assert atlas.shape == (36, 3)


def test_reference_atlas_placeholders():
    atlas, wins = textures.reference_atlas("/nonexistent")
    assert len(wins) == 4
    assert atlas.shape[0] == sum(w * h for _, w, h in wins)
    mats = builtin_materials(wins)
    assert mats[11].tex_start == wins[0][0]
    assert mats[13].tex_start == wins[2][0]


def test_bilinear_sample_wrap():
    # 2x2 checker: texel (0,0)=white, (1,0)=black, (0,1)=black, (1,1)=white
    img = np.array([[[1, 1, 1], [0, 0, 0]], [[0, 0, 0], [1, 1, 1]]],
                   np.float32)
    atlas = jnp.asarray(img.reshape(-1, 3))
    start = jnp.zeros((3,), jnp.int32)
    w = jnp.full((3,), 2, jnp.int32)
    h = jnp.full((3,), 2, jnp.int32)
    # uv at texel centers: (0.25, 0.25) -> texel (0,0) exactly
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.25], [0.5, 0.5]])
    out = np.asarray(bsdf_ops.sample_texture(atlas, start, w, h, uv))
    np.testing.assert_allclose(out[0], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0.5, 0.5, 0.5], atol=1e-6)  # bilerp


def test_textured_material_changes_render():
    """A textured diffuse floor must pick up the checker pattern."""
    b = textures.AtlasBuilder()
    win = b.add_image(checker_texture(16, (1, 0, 0), (0, 0, 1)).reshape(16, 16, 3))
    mats = builtin_materials([win])
    from cudapathtracer_tpu.utils.obj import MeshData
    m = MeshData()
    # floor quad with uvs
    pts = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    m.add(pts, idx, 11, uvs=uvs, uv_idx=idx)
    scene, _ = build_scene(m, mats, textures=b.build())

    from cudapathtracer_tpu.ops import traverse
    # probe points in DIFFERENT checker cells (not on the same diagonal)
    o = jnp.asarray([[0.1, 1.0, 0.1], [-0.9, 1.0, 0.1]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]] * 2, jnp.float32)
    hit = traverse.closest_hit(scene, o, d)
    info = traverse.interpolate_hit(scene, o, d, hit)
    mat = scene.materials.gather(info["mat_id"])
    alb = np.asarray(bsdf_ops.resolve_albedo(scene, mat, info["uv"]))
    # two different checker cells -> different colors
    assert np.abs(alb[0] - alb[1]).max() > 0.5


def test_transmission_map_resolution():
    b = textures.AtlasBuilder()
    tmap = np.full((4, 4, 3), 0.75, np.float32)
    win = b.add_image(tmap)
    leaf = Material.leaf(transmission=0.1, trans_tex_start=win[0],
                         trans_tex_width=win[1], trans_tex_height=win[2])
    plain = Material.leaf(transmission=0.1)
    table = build_table([leaf, plain])
    import jax
    rows = table.gather(jnp.asarray([0, 1], jnp.int32))

    class FakeScene:
        textures = jnp.asarray(b.build())
    uv = jnp.asarray([[0.5, 0.5], [0.5, 0.5]])
    out = np.asarray(bsdf_ops.resolve_transmission(FakeScene, rows, uv))
    np.testing.assert_allclose(out, [0.75, 0.1], atol=1e-6)


def test_trans_map_changes_render():
    """End-to-end: a leaf panel's transmission MAP must drive the image
    (reflectors.cuh:573-578 — trans map resolved before every dispatch).
    Two identical scenes differing only in the map's red channel must
    render differently; identical maps must render bit-identically."""
    import jax

    from cudapathtracer_tpu.models import unidirectional
    from cudapathtracer_tpu.scene.builtin import quad
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.utils import rng
    from cudapathtracer_tpu.utils.obj import MeshData

    def render(tval):
        b = textures.AtlasBuilder()
        tmap = np.full((4, 4, 3), tval, np.float32)
        win = b.add_image(tmap)
        mats = [Material.diffuse((0.7, 0.7, 0.7)),
                Material.leaf(albedo=(0.8, 0.8, 0.8), transmission=0.5,
                              trans_tex_start=win[0],
                              trans_tex_width=win[1],
                              trans_tex_height=win[2])]
        m = MeshData()
        # vertical leaf panel right in front of the camera, emissive wall
        # behind it: the transmitted lobe dominates the view
        quad(m, (-1.5, -1.5, 0), (1.5, -1.5, 0), (1.5, 1.5, 0),
             (-1.5, 1.5, 0), 1)
        quad(m, (-1.5, -1.5, -1.0), (1.5, -1.5, -1.0), (1.5, 1.5, -1.0),
             (-1.5, 1.5, -1.0), 0, emission=(8.0, 8.0, 8.0))
        scene, _ = build_scene(m, mats, textures=b.build())
        assert scene.has_trans_maps
        w = h = 24
        cam = Camera.pinhole((0.0, 0.0, 2.0), w, h, 0.0, 0.0, 0.0, 60.0)
        px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
        li, _ = unidirectional.render_sample(
            scene, cam, rng.base_key(), jnp.int32(0), px.ravel(), py.ravel(),
            max_depth=4)
        return np.asarray(li)

    img_opaque = render(0.0)
    img_clear = render(0.95)
    img_clear2 = render(0.95)
    assert np.isfinite(img_opaque).all() and np.isfinite(img_clear).all()
    np.testing.assert_array_equal(img_clear, img_clear2)
    # the map value must actually change the image
    diff = np.abs(img_clear - img_opaque).mean()
    assert diff > 1e-3, f"trans map had no effect (mean abs diff {diff})"
