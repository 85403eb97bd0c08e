"""SDS acceptance tests (SURVEY.md §7 Phase-5 acceptance; the reference's
signature capability, README §Problems-with-BDPT).

Scene: a diffuse sphere fully enclosed in a glass shell
(builtin.cornell_glass_core) — every path lighting the core is
L -> S -> D -> S -> E. With the naive (s=0 implicit) strategy disabled,
BDPT cannot light the core at all: NEE and light-trace splats are blocked
by the shell, and any s>=2 connection between two core vertices is
occluded by the core itself (the chord of a convex body lies inside it).
VCM/SPPM photon merging needs no connecting shadow ray, so it renders the
core. The core-region pixels keep a legitimate non-SDS floor of energy
from the shell's Fresnel reflection of the box, which BDPT does render —
hence a ratio bound rather than an absolute-zero bound."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.models import bdpt, vcm
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng

W = 24
SPP = 8


@pytest.fixture(scope="module")
def glass_core():
    scene, _ = build_scene(builtin.cornell_glass_core(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), W, W, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(W))
    return scene, cam, px.ravel(), py.ravel()


def render(setup, fn, spp, **kw):
    scene, cam, px, py = setup
    key = rng.base_key()
    acc = np.zeros((W * W, 3), np.float32)
    for s in range(spp):
        li, _ = fn(scene, cam, key, s, px, py, **kw)
        acc += np.asarray(li)
    return (acc / spp).reshape(W, W, 3)


def core_mean(img):
    """Mean over the pixels covering the enclosed core (sphere at
    (0,-0.1,0), r=0.15, seen from the shipped camera)."""
    return float(img[10:16, 9:15].mean())


def test_vcm_renders_sds_core_bdpt_cannot(glass_core):
    vcfg = vcm.VCMConfig(eye_depth=8, light_depth=6, r0_multiplier=0.03,
                         naive=False)
    img_vcm = render(glass_core, vcm.render_sample, SPP, cfg=vcfg)
    assert np.isfinite(img_vcm).all()

    bcfg = bdpt.BDPTConfig(eye_depth=8, light_depth=6, naive=False)
    img_bdpt = render(glass_core, bdpt.render_sample, SPP, cfg=bcfg)
    assert np.isfinite(img_bdpt).all()

    v, b = core_mean(img_vcm), core_mean(img_bdpt)
    # measured at this seed: VCM ~0.72, BDPT ~0.24 (reflection floor only)
    assert v > 2.0 * b, f"VCM core {v:.4f} not >> BDPT core {b:.4f}"
    assert v > 0.1, f"VCM core region unexpectedly dark: {v:.4f}"


def test_sppm_agrees_with_vcm_on_sds_core(glass_core):
    """SPPM (merge-only) and full VCM are different estimator mixes of the
    same transport; the SDS core energy must agree between them."""
    vcfg = vcm.VCMConfig(eye_depth=8, light_depth=6, r0_multiplier=0.03,
                         naive=False)
    img_vcm = render(glass_core, vcm.render_sample, SPP, cfg=vcfg)
    scfg = vcm.VCMConfig(eye_depth=8, light_depth=6, r0_multiplier=0.03,
                         light_trace=False, nee=False, naive=False,
                         connection=False, do_mis=False, do_sppm=True)
    img_sppm = render(glass_core, vcm.render_sample, SPP, cfg=scfg)
    v, s = core_mean(img_vcm), core_mean(img_sppm)
    assert s > 0.1
    assert abs(v - s) / max(v, s) < 0.5, \
        f"VCM {v:.4f} vs SPPM {s:.4f} disagree on the SDS core"
