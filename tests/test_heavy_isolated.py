"""Subprocess wrappers for the heavy-compile mega-engine test modules.

tests/conftest.py removes test_vcm_mega.py / test_bdpt_mega.py from
in-process collection (observed: a flaky XLA:CPU segfault inside
backend_compile late in a ~50-minute suite run killed the whole pytest
process at test 134/139, while the same module passes in isolation). Each
wrapper here runs one of those modules in a FRESH interpreter, so a
compiler crash fails exactly one test with the subprocess log attached.

Direct debugging: TPT_HEAVY_DIRECT=1 python -m pytest tests/test_vcm_mega.py
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_module(name: str):
    env = {**os.environ, "TPT_HEAVY_DIRECT": "1"}
    for attempt in (0, 1):
        r = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.join("tests", name),
             "-q", "-x"],
            cwd=_ROOT, env=env, capture_output=True, text=True,
            timeout=3600)
        if r.returncode == 0:
            return
        # signal exits (segfault/abort = 128+N) are the flaky XLA:CPU
        # compiler crash this wrapper exists for — retry once in a fresh
        # process; real test failures (rc 1) fail immediately
        if r.returncode < 128 or attempt == 1:
            break
    pytest.fail(f"{name} failed in isolated subprocess "
                f"(rc={r.returncode}):\n"
                f"{r.stdout[-6000:]}\n{r.stderr[-3000:]}")


def test_vcm_mega_isolated():
    _run_module("test_vcm_mega.py")


def test_bdpt_mega_isolated():
    _run_module("test_bdpt_mega.py")


def test_vcm_isolated():
    _run_module("test_vcm.py")


def test_sharding_isolated():
    _run_module("test_sharding.py")
