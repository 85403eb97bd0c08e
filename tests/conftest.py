"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import
so sharding tests run without TPU hardware (SURVEY.md §4). The environment
pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so we must override — not
setdefault — both platform variables."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# CPU XLA compile time explodes with the unrolled traversal body; one step
# per while iteration keeps the suite fast (TPU default is 4)
os.environ.setdefault("TPT_STEPS_PER_ITER", "1")
# Same for the persistent mega-wavefront schedule (TPU default 24/6):
# XLA:CPU compile is super-linear in the unrolled body (132s at spi=8 on a
# 16x16 golden). The image is schedule-invariant, so goldens still match.
os.environ.setdefault("TPT_MEGA_STEPS_PER_ITER", "1")
os.environ.setdefault("TPT_MEGA_MINI_SPLITS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# pytest plugins (xdist/anyio/...) import jax before this conftest runs, and
# jax snapshots JAX_PLATFORMS into its config at import — override it too
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent XLA compile cache shared by the whole suite INCLUDING the
    # subprocess-isolated heavy modules (test_heavy_isolated.py inherits the
    # environment): the isolated modules re-compiled everything per
    # subprocess, which dominated the ~35-min full-suite wall (round-3
    # VERDICT item 7). Probed round 4: cache hits work on XLA:CPU when
    # JAX_PLATFORMS/JAX_PLATFORM_NAME are both forced to cpu (they are,
    # above); on the axon TPU tunnel the cache is NOT used (hit-vs-init
    # hangs could not be disambiguated from tunnel flakiness — bench keeps
    # cold compiles for reliability). The 1-s threshold keeps the thousands
    # of trivial sub-second executables out of the cache directory.
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    # env var too, so spawned subprocesses (heavy isolation, CLI tests)
    # share the same cache even before their conftest runs
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    pass

# ---------------------------------------------------------------------------
# Heavy-compile isolation: the mega-engine VCM/BDPT modules (and the
# many-config classic VCM module) carry the suite's biggest XLA graphs,
# and XLA:CPU has been observed to flakily segfault inside
# backend_compile late in a long suite run (the same modules pass in
# isolation; observed at test 134/139 in round 2 and on test_vcm.py's
# last test in round 3). They are therefore collected OUT of the
# in-process run and executed in fresh subprocesses by
# tests/test_heavy_isolated.py — one compiler crash can then fail one
# wrapper test (with one retry for signal exits) instead of killing the
# whole pytest process. Run them directly with TPT_HEAVY_DIRECT=1, e.g.
#   TPT_HEAVY_DIRECT=1 python -m pytest tests/test_vcm_mega.py
# The smoke tier (-m smoke) keeps collecting them in-process: its subset
# is small and starts from a fresh process anyway.
# test_sharding.py joined the set in round 5: its 8-device pjit
# executables are now the largest in-process compiles, and the flaky
# crash moved there (observed once in the cache-write path,
# compilation_cache.put_executable_and_time, mid-full-suite).
HEAVY_MODULES = {"test_vcm_mega.py", "test_bdpt_mega.py", "test_vcm.py",
                 "test_sharding.py"}


def pytest_ignore_collect(collection_path, config):
    if os.environ.get("TPT_HEAVY_DIRECT") == "1":
        return None
    if "smoke" in (config.getoption("-m") or ""):
        return None
    if collection_path.name in HEAVY_MODULES:
        return True
    return None
