"""Texture atlas assembly.

Equivalent of the reference's hard-coded texture setup (main.cu:364-391):
BMP images are loaded (NOT sRGB-decoded — the reference passes
loadBMPToImage(..., false)) and concatenated into one flat [A, 3] float32
atlas; each image's (start, width, height) window is stored per material.
The reference's textures/*.bmp are absent from its repo, so missing files
fall back to deterministic procedural placeholders.
"""

from __future__ import annotations

import os

import numpy as np

from cudapathtracer_tpu.scene.builtin import checker_texture
from cudapathtracer_tpu.utils.image import load_bmp

# the reference's hard-coded list (main.cu:371-374)
REFERENCE_TEXTURES = (
    "textures/enkidutexture.bmp",
    "textures/enkiduchibitexture.bmp",
    "textures/leaftex2.bmp",
    "textures/leafautumn.bmp",
)


class AtlasBuilder:
    """Accumulate images into a flat atlas; returns (start, w, h) windows."""

    def __init__(self):
        self.blocks: list[np.ndarray] = []
        self.windows: list[tuple[int, int, int]] = []
        self._cursor = 0

    def add_image(self, rgb: np.ndarray) -> tuple[int, int, int]:
        h, w = rgb.shape[:2]
        flat = np.asarray(rgb, np.float32).reshape(-1, 3)
        win = (self._cursor, w, h)
        self.blocks.append(flat)
        self.windows.append(win)
        self._cursor += flat.shape[0]
        return win

    def add_bmp(self, path: str, placeholder_size: int = 64
                ) -> tuple[int, int, int]:
        if os.path.exists(path):
            return self.add_image(load_bmp(path, decode_srgb=False))
        # deterministic placeholder keyed by the filename
        seed = sum(map(ord, os.path.basename(path))) % 7
        c0 = (0.9, 0.85, 0.8)
        c1 = ((0.2 + 0.1 * seed) % 1.0, (0.5 + 0.13 * seed) % 1.0,
              (0.3 + 0.07 * seed) % 1.0)
        img = checker_texture(placeholder_size, c0, c1).reshape(
            placeholder_size, placeholder_size, 3)
        return self.add_image(img)

    def build(self) -> np.ndarray:
        if not self.blocks:
            return np.zeros((1, 3), np.float32)
        return np.concatenate(self.blocks, axis=0)


def reference_atlas(base_dir: str = ".") -> tuple[np.ndarray, list]:
    """Build the reference's 4-texture atlas (placeholders where files are
    missing, as in the reference repo itself). Returns (atlas [A,3],
    windows [(start,w,h) x4]) — feed windows to builtin_materials()."""
    b = AtlasBuilder()
    wins = [b.add_bmp(os.path.join(base_dir, p)) for p in REFERENCE_TEXTURES]
    return b.build(), wins
