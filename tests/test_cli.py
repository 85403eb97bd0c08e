import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.smoke
def test_cli_end_to_end(tmp_path):
    """Render a tiny frame through the actual CLI entry point."""
    cfg = tmp_path / "t.rendertron"
    cfg.write_text(
        "Name: clitest\n"
        "width: 12\nheight: 12\n"
        "Integrator: UNIDIRECTIONAL\nSample Count: 2\nPost Process: true\n"
        "Unidirectional Max Depth: 3\nBVH recommended leaf size: 2\n"
        "Pinhole Camera: true\nCamera Position: 0.0 0.0 1.0\n"
        "Camera Rotation: 0.0 0.0 0.0\nCamera FOV: 60.0\n"
        f"Output Dir: {tmp_path}/out\n"
        "Meshes (path; multiplier * emission; materialID):\n"
        "builtin:cornell_blocks; 1.0 * (0.0, 0.0, 0.0); 2\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               TPT_STEPS_PER_ITER="1")
    r = subprocess.run(
        [sys.executable, "-m", "cudapathtracer_tpu", str(cfg),
         "--no-progressive"],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "saved" in r.stdout
    bmp = tmp_path / "out" / "clitest0.bmp"
    assert bmp.exists()
    from cudapathtracer_tpu.utils.image import load_bmp
    img = load_bmp(str(bmp), decode_srgb=False)
    assert img.shape == (12, 12, 3)
    assert np.isfinite(img).all() and img.mean() > 0
