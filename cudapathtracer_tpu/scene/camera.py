"""Camera: pinhole / thin-lens, primary ray generation, raster projection.

Same optical model as the reference Camera (objects.cuh:199-375): Euler-XYZ
rotated basis, fovScale = tan(FOV/2), +/-1px anti-alias jitter, circular lens
disk sampled with r = aperture*sqrt(u), focal plane at focalDist along
forward. Local forward is (0,0,-1). Ray generation here is batched: one call
produces the whole wavefront of primary rays.

The pinhole factory keeps the reference's quirky defaults (aperture=1e-6,
focalDist=1/FOV_degrees — objects.cuh:235-236) so images match.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.utils import math as vmath
from cudapathtracer_tpu.utils import rng


def _rotate_xyz(v, xr, yr, zr):
    return vmath.rotate_z(vmath.rotate_y(vmath.rotate_x(v, xr), yr), zr)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    origin: jax.Array          # [3]
    forward: jax.Array         # [3]
    right: jax.Array           # [3]
    up: jax.Array              # [3]
    fov_scale: jax.Array       # scalar
    aperture: jax.Array        # scalar
    focal_dist: jax.Array      # scalar
    width: int = field(metadata=dict(static=True), default=0)
    height: int = field(metadata=dict(static=True), default=0)
    aa_jitter: float = field(metadata=dict(static=True), default=2.0)

    @staticmethod
    def _make(origin, w, h, xr_deg, yr_deg, zr_deg, fov_deg, aperture,
              focal_dist, aa_jitter=2.0) -> "Camera":
        d2r = math.pi / 180.0
        xr, yr, zr = xr_deg * d2r, yr_deg * d2r, zr_deg * d2r
        fwd = _rotate_xyz(jnp.asarray([0.0, 0.0, -1.0]), xr, yr, zr)
        rgt = _rotate_xyz(jnp.asarray([1.0, 0.0, 0.0]), xr, yr, zr)
        up = _rotate_xyz(jnp.asarray([0.0, 1.0, 0.0]), xr, yr, zr)
        return Camera(
            origin=jnp.asarray(origin, jnp.float32),
            forward=vmath.normalize(fwd), right=vmath.normalize(rgt),
            up=vmath.normalize(up),
            fov_scale=jnp.float32(math.tan(fov_deg * 0.5 * d2r)),
            aperture=jnp.float32(aperture), focal_dist=jnp.float32(focal_dist),
            width=w, height=h, aa_jitter=aa_jitter)

    @staticmethod
    def pinhole(origin, w, h, xr_deg, yr_deg, zr_deg, fov_deg,
                aa_jitter=2.0) -> "Camera":
        """objects.cuh:221-242: aperture=1e-6, focalDist=1/FOV."""
        return Camera._make(origin, w, h, xr_deg, yr_deg, zr_deg, fov_deg,
                            1e-6, 1.0 / fov_deg, aa_jitter)

    @staticmethod
    def thin_lens(origin, w, h, xr_deg, yr_deg, zr_deg, fov_deg, aperture,
                  focal_dist, aa_jitter=2.0) -> "Camera":
        return Camera._make(origin, w, h, xr_deg, yr_deg, zr_deg, fov_deg,
                            aperture, focal_dist, aa_jitter)

    @staticmethod
    def from_config(cfg) -> "Camera":
        if cfg.pinhole_camera:
            return Camera.pinhole(cfg.cam_pos, cfg.width, cfg.height,
                                  *cfg.cam_rot, cfg.cam_fov)
        return Camera.thin_lens(cfg.cam_pos, cfg.width, cfg.height,
                                *cfg.cam_rot, cfg.cam_fov, cfg.cam_aperture,
                                cfg.cam_focal_dist)

    def generate_rays(self, key: jax.Array, px: jax.Array, py: jax.Array,
                      ids=None):
        """Batched primary ray generation (objects.cuh:268-307).

        px, py: integer pixel coords [N]. Returns (origins [N,3], dirs [N,3]).
        With `ids` (stable pixel ids), sampling is wavefront-layout
        independent (utils/rng.py *_id streams).
        """
        n = px.shape[0]
        jx = rng.uniform_any(key, 0, n, ids) - 0.5
        jy = rng.uniform_any(key, 1, n, ids) - 0.5
        aspect = self.width / self.height
        u = (2.0 * (px + jx * self.aa_jitter) / self.width - 1.0) * aspect * self.fov_scale
        v = (2.0 * (py + jy * self.aa_jitter) / self.height - 1.0) * self.fov_scale

        focal = (self.origin + self.right * (u * self.focal_dist)[:, None]
                 + self.up * (v * self.focal_dist)[:, None]
                 + self.forward * self.focal_dist)

        # lens disk sample (only effective when aperture > tiny)
        r_rnd = rng.uniform_any(key, 2, n, ids)
        theta = 2.0 * math.pi * rng.uniform_any(key, 3, n, ids)
        radius = self.aperture * jnp.sqrt(r_rnd)
        lens = (self.right * (radius * jnp.cos(theta))[:, None]
                + self.up * (radius * jnp.sin(theta))[:, None])
        lens = jnp.where(self.aperture > 0.0, lens, 0.0)

        origin = self.origin + lens
        direction = vmath.normalize(focal - origin)
        return origin, direction

    def world_to_raster(self, p: jax.Array):
        """Project world points [N,3] to pixel coords; the light-tracing
        "sensor" (objects.cuh:343-374). Returns (px [N], py [N], valid [N])."""
        d = p - self.origin
        dist_z = vmath.dot(d, self.forward)
        ok = dist_z > 0.001
        safe_z = jnp.where(ok, dist_z, 1.0)
        slope_x = vmath.dot(d, self.right) / safe_z
        slope_y = vmath.dot(d, self.up) / safe_z
        aspect = self.width / self.height
        ndc_x = slope_x / (aspect * self.fov_scale)
        ndc_y = slope_y / self.fov_scale
        ok = ok & (jnp.abs(ndc_x) <= 1.0) & (jnp.abs(ndc_y) <= 1.0)
        px = (ndc_x + 1.0) * 0.5 * self.width
        py = (ndc_y + 1.0) * 0.5 * self.height
        return px, py, ok

    def importance(self, d_world: jax.Array):
        """Pinhole camera importance We and direction pdf for a (normalized)
        direction from the lens (deviceCode.cu:1366-1369, 770-778):
          area of image plane at unit distance A = 4*aspect*fovScale^2
          pdf_dir = 1/(A cos^3), We = 1/(A cos^4).
        Returns (we [N], pdf_dir [N]) with cos clamped away from 0."""
        cos_t = vmath.dot(d_world, self.forward)
        cos_t = jnp.maximum(cos_t, 1e-6)
        aspect = self.width / self.height
        a_plane = 4.0 * aspect * self.fov_scale * self.fov_scale
        cos3 = cos_t * cos_t * cos_t
        pdf_dir = 1.0 / (a_plane * cos3)
        we = pdf_dir / cos_t
        return we, pdf_dir
