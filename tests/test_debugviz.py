import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu.models import paths
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import debugviz, rng


def make_cam():
    return Camera.pinhole((0.0, 0.0, 1.0), 32, 32, 0.0, 0.0, 0.0, 60.0)


def test_draw_line_and_composite():
    cam = make_cam()
    ov = debugviz.make_overlay(32, 32)
    debugviz.draw_line(ov, cam, (-0.4, 0.0, 0.0), (0.4, 0.0, 0.0),
                       (1.0, 0.0, 0.0))
    assert (ov[..., 0] > 0).sum() > 5
    img = np.full((32, 32, 3), 0.5, np.float32)
    out = debugviz.composite_overlay(img, ov)
    mask = (ov != 0).any(-1)
    assert (out[mask][:, 0] == 1.0).all()
    assert (out[~mask] == 0.5).all()


def test_grid_box_and_photon_heatmap():
    cam = make_cam()
    ov = debugviz.make_overlay(32, 32)
    debugviz.paint_grid_box(ov, cam, (-0.3, -0.3, -0.3), (0.3, 0.3, 0.3))
    assert (ov != 0).any()
    ov2 = debugviz.make_overlay(32, 32)
    pts = np.random.RandomState(0).uniform(-0.4, 0.4, (500, 3))
    debugviz.paint_photons(ov2, cam, pts)
    assert ov2[..., 0].max() > 0.05  # density accumulates


def test_bdpt_path_overlay_draws_paths():
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = make_cam()
    px, py = jnp.meshgrid(jnp.arange(32), jnp.arange(32))
    ov = debugviz.bdpt_path_overlay(scene, cam, rng.base_key(),
                                    px.ravel(), py.ravel(), eye_depth=4,
                                    max_paths=8)
    assert ov.shape == (32, 32, 3)
    assert (ov != 0).any(), "eye paths must rasterize into the overlay"


def test_drawpath_channel_composites_in_driver(tmp_path):
    from cudapathtracer_tpu.driver import Renderer
    from cudapathtracer_tpu.utils.config import RenderConfig

    base = dict(width=24, height=24, sample_count=1, integrator="BIDIRECTIONAL",
                bdpt_eye_depth=3, bdpt_light_depth=2,
                pinhole_camera=True, cam_pos=(0.0, 0.0, 1.0),
                meshes=[], output_dir=str(tmp_path))
    cfg_off = RenderConfig(**base)
    cfg_on = RenderConfig(**base, bdpt_draw_path=True)
    from cudapathtracer_tpu.scene import builtin as b
    mesh = b.cornell_with_blocks()
    r_off = Renderer(cfg_off, mesh=mesh)
    r_on = Renderer(cfg_on, mesh=mesh)
    r_off.render(num_samples=1, progressive=False, verbose=False)
    r_on.render(num_samples=1, progressive=False, verbose=False)
    fb_off = r_off.framebuffer()
    fb_on = r_on.framebuffer()
    assert (fb_off != fb_on).any(), "DRAWPATH overlay must change the image"


def test_debug_print_path(capsys):
    scene, _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    cam = make_cam()
    px, py = jnp.meshgrid(jnp.arange(4), jnp.arange(4))
    bufs, v0, _esc, _ = paths.generate_eye_path(scene, cam, rng.base_key(),
                                          px.ravel(), py.ravel(), 4)
    out = debugviz.debug_print_path(bufs, lane=5)
    assert "pt=" in out and "beta=" in out
