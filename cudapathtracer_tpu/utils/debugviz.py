"""Debug visualization: overlay lines, path drawing, photon heatmaps.

Capability parity with the reference's debug channel (objects.cuh:377-547
drawLine/drawPath/debugPrintPath, deviceCode.cu:3200-3254 paintPhotons/
paintGridBox): an RGB overlay buffer composited over the render wherever it
is non-black (cleanAndFormatImage semantics, integratorUtilities.cuh:368-372).
Host-side numpy — these are diagnostics, not hot paths. The MIS-weight render
channel (BDPT_PAINTWEIGHT) lives in the integrators as a static flag.
"""

from __future__ import annotations

import numpy as np


def make_overlay(width: int, height: int) -> np.ndarray:
    return np.zeros((height, width, 3), np.float32)


def draw_line(overlay: np.ndarray, camera, p0, p1, color=(1.0, 0.0, 0.0),
              samples: int = 256) -> np.ndarray:
    """Project a 3D segment and rasterize it into the overlay (the
    reference's Bresenham drawLine, objects.cuh:377-471)."""
    import jax.numpy as jnp

    t = np.linspace(0.0, 1.0, samples, dtype=np.float32)[:, None]
    pts = np.asarray(p0, np.float32)[None] * (1 - t) \
        + np.asarray(p1, np.float32)[None] * t
    px, py, ok = camera.world_to_raster(jnp.asarray(pts))
    px = np.asarray(px).astype(int)
    py = np.asarray(py).astype(int)
    ok = np.asarray(ok)
    h, w = overlay.shape[:2]
    m = ok & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    overlay[py[m], px[m]] = np.asarray(color, np.float32)
    return overlay


def draw_path(overlay: np.ndarray, camera, points: np.ndarray,
              color=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Rasterize a polyline of path vertices (drawPath, objects.cuh:474-502)."""
    for a, b in zip(points[:-1], points[1:]):
        draw_line(overlay, camera, a, b, color)
    return overlay


def paint_photons(overlay: np.ndarray, camera, positions: np.ndarray,
                  valid=None, gain: float = 0.05) -> np.ndarray:
    """Photon-density heatmap splat (paintPhotons, deviceCode.cu:3200-3230)."""
    import jax.numpy as jnp

    pos = np.asarray(positions, np.float32).reshape(-1, 3)
    if valid is not None:
        pos = pos[np.asarray(valid).reshape(-1)]
    if pos.size == 0:
        return overlay
    px, py, ok = camera.world_to_raster(jnp.asarray(pos))
    px = np.asarray(px).astype(int)
    py = np.asarray(py).astype(int)
    ok = np.asarray(ok)
    h, w = overlay.shape[:2]
    m = ok & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    np.add.at(overlay, (py[m], px[m], np.zeros(m.sum(), int)), gain)
    np.add.at(overlay, (py[m], px[m], np.full(m.sum(), 1)), gain * 0.4)
    return overlay


def paint_grid_box(overlay: np.ndarray, camera, cell_min, cell_max,
                   color=(0.0, 0.4, 1.0)) -> np.ndarray:
    """Wireframe an AABB (paintGridBox, deviceCode.cu:3232-3254)."""
    x0, y0, z0 = cell_min
    x1, y1, z1 = cell_max
    c = [(x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0),
         (x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)]
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for a, b in edges:
        draw_line(overlay, camera, c[a], c[b], color, samples=64)
    return overlay


def bdpt_path_overlay(scene, camera, key, px, py, eye_depth: int,
                      max_paths: int = 48) -> np.ndarray:
    """BDPT_DRAWPATH channel: rasterize eye paths into an overlay
    (deviceCode.cu:1796-1800 — the reference calls drawPath on a pixel's eye
    path whenever one of its (t,s) connectPath attempts fails, which in
    practice marks nearly every pixel and the overlays overwrite each other;
    the usable form of the same diagnostic is a deterministic sparse subset
    of pixels, drawn camera-endpoint -> deepest vertex with a per-path
    pseudo-random color like the reference's curand color draw).
    """
    import jax.numpy as jnp

    from cudapathtracer_tpu.models import paths as paths_mod
    from cudapathtracer_tpu.utils import rng as rng_mod

    n = int(px.shape[0])
    stride = max(n // max_paths, 1)
    sel = np.arange(0, n, stride, dtype=np.int32)[:max_paths]
    pxs = jnp.asarray(np.asarray(px)[sel])
    pys = jnp.asarray(np.asarray(py)[sel])
    ids = rng_mod.pixel_ids(pxs, pys)
    bufs, v0, _esc, _rays = paths_mod.generate_eye_path(
        scene, camera, key, pxs, pys, max_depth=eye_depth, ids=ids)

    overlay = make_overlay(camera.width, camera.height)
    pts = np.asarray(bufs.pt)            # [D, S, 3]
    valid = np.asarray(bufs.valid)       # [D, S]
    origins = np.asarray(v0["pt"])       # [S, 3]
    for i in range(pts.shape[1]):
        depth = int(valid[:, i].argmin()) if not valid[:, i].all() \
            else valid.shape[0]
        if valid[:, i].size and not valid[0, i]:
            depth = 0
        chain = np.concatenate([origins[i][None], pts[:depth, i]], axis=0)
        if chain.shape[0] < 2:
            continue
        # per-path color from a hash of the pixel id (the reference uses
        # three curand draws; any decorrelated color stream is equivalent)
        h = (int(sel[i]) * 2654435761) & 0xFFFFFFFF
        color = (0.25 + 0.75 * ((h >> 0) & 255) / 255.0,
                 0.25 + 0.75 * ((h >> 8) & 255) / 255.0,
                 0.25 + 0.75 * ((h >> 16) & 255) / 255.0)
        draw_path(overlay, camera, chain, color)
    return overlay


def composite_overlay(image: np.ndarray, overlay: np.ndarray) -> np.ndarray:
    """Overlay overrides the render where non-black
    (integratorUtilities.cuh:368-372)."""
    mask = (overlay != 0).any(axis=-1, keepdims=True)
    return np.where(mask, overlay, image)


def debug_print_path(bufs, lane: int, limit: int = 16) -> str:
    """Dump one lane's path vertices (debugPrintPath, objects.cuh:504-547).
    bufs: models.paths.PathBuffers. Returns the formatted string."""
    import numpy as np

    lines = []
    d = min(bufs.pt.shape[0], limit)
    for k in range(d):
        if not bool(np.asarray(bufs.valid[k][lane])):
            break
        pt = np.asarray(bufs.pt[k][lane])
        beta = np.asarray(bufs.beta[k][lane])
        lines.append(
            f"v{k}: pt=({pt[0]:+.4f},{pt[1]:+.4f},{pt[2]:+.4f}) "
            f"beta=({beta[0]:.3g},{beta[1]:.3g},{beta[2]:.3g}) "
            f"pdfFwd={float(np.asarray(bufs.pdf_fwd[k][lane])):.3g} "
            f"delta={bool(np.asarray(bufs.is_delta[k][lane]))} "
            f"mat={int(np.asarray(bufs.mat_id[k][lane]))} "
            f"light={int(np.asarray(bufs.light_ind[k][lane]))}")
    out = "\n".join(lines) if lines else "(empty path)"
    print(out)
    return out
