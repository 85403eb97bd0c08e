#!/usr/bin/env python
"""Benchmark harness.

Emits ONE JSON line per benchmark: every BASELINE.md config (1: 512^2
Cornell, 2: specular spheres, 3: 1080p Cornell+mesh, 4: NEE+GGX, 5:
multi-chip dryrun stand-in) and every integrator (naive/uni/mega/BDPT/
VCM/SPPM) at a fixed small workload — so round-over-round regressions are
visible for all of them.

Harness discipline (round-3 redesign after BENCH_r02 rc=124 lost the
headline): every line is EMITTED THE MOMENT IT IS MEASURED, the HEADLINE
(mega-wavefront unidirectional, 1080p Cornell+mesh — BASELINE config 3)
is measured and emitted FIRST, the whole run works under a wall-clock
deadline (--deadline-s) that skips remaining lines instead of dying, each
line is exception-contained, and the headline is RE-EMITTED as the final
line so tail parsers pick it up. Exit code is 0 whenever the headline was
captured.

The reference publishes no numbers (BASELINE.md: "published": {}), so
vs_baseline is reported against this repo's self-imposed target of
TARGET_MRAYS on one chip — the driver records the absolute value per round.

Usage: python bench.py [--small] [--spp N] [--headline-only]
                       [--skip-suite-slow] [--deadline-s S]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

# Persistent XLA compile cache (probed round 4: cache HITS work through
# the axon tunnel — a 76 s compile reloads in 0.7 s; the earlier "hang"
# was a tunnel outage, not the cache). Compiles are this harness's
# dominant cost on the 1-core host, and the cache directory persists in
# the repo across rounds, so a warmed cache collapses the suite wall.
# BENCH_NO_CACHE=1 restores cold compiles.
if not os.environ.get("BENCH_NO_CACHE"):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

TARGET_MRAYS = 100.0  # self-imposed round-over-round target (no published ref)

_T0 = time.monotonic()


def _elapsed():
    return time.monotonic() - _T0


def _emit(result):
    print(json.dumps(result), flush=True)


def _grid(w, h):
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    return px.ravel(), py.ravel()


def _time_samples(step, spp, warmup=1, inner=None, ctx=None, batch=1):
    """Run `step(sample_idx) -> (li, rays)` spp times after a warmup
    compile; returns (seconds, total_rays, accumulated_image).

    With batch > 1 (requires inner/ctx: the explicit-arg per-sample step
    and its (scene, cam, key, px, py) arguments), samples are accumulated
    device-side in one dispatch per `batch` samples (models/batch.py) —
    amortizing the ~24 ms tunnel dispatch floor that dominates small
    frames."""
    if batch > 1:
        from cudapathtracer_tpu.models.batch import make_batched
        scene, cam, key, px, py = ctx
        batched = make_batched(inner)
        k0 = min(batch, spp)
        li, rays = batched(scene, cam, key, warmup - 1, px, py, k0)
        _ = float(li.sum())  # forces completion through the axon tunnel
        acc = jnp.zeros_like(li)
        rtot = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        s = warmup
        while s < warmup + spp:
            k = min(batch, warmup + spp - s)
            li, rays = batched(scene, cam, key, s, px, py, k)
            acc = acc + li
            rtot = rtot + rays
            s += k
            _ = float(rays)
        img = np.asarray(acc)
        dt = time.perf_counter() - t0
        assert np.isfinite(img).all(), "NaN/Inf in benchmark render"
        return dt, int(rtot), img
    li, rays = step(warmup - 1)
    _ = float(li.sum())  # forces completion through the axon tunnel
    acc = jnp.zeros_like(li)
    rtot = jnp.zeros((), jnp.int32)
    t0 = time.perf_counter()
    for s in range(warmup, warmup + spp):
        li, rays = step(s)
        acc = acc + li
        rtot = rtot + rays
        # bounded in-flight queue (the tunnel deadlocks with tens of big
        # async dispatches queued; one scalar fetch keeps ~1 in flight)
        _ = float(rays)
    img = np.asarray(acc)  # the real barrier
    dt = time.perf_counter() - t0
    assert np.isfinite(img).all(), "NaN/Inf in benchmark render"
    return dt, int(rtot), img


def bench_inner(inner, ctx, spp, metric, *, extra=None, batch=1, best_of=1):
    """Time an explicit-arg per-sample step `inner(scene,cam,key,s,px,py)`
    over best_of windows and return the fastest window's line.

    The shared remote-TPU tunnel's delivered throughput swings 2-3x hour
    to hour (docs/ROADMAP.md measurement notes): the same committed code
    measured 10.9 and 5.0 Mrays/s on different days. A throughput metric
    should report what the DEVICE can do, not how congested the tunnel
    happened to be, so with best_of > 1 the samples run in best_of
    windows and the fastest window is reported (per-window spp/rays stay
    identical — same compiled executable, same workload)."""
    scene, cam, key, px, py = ctx
    dt_sum = 0.0
    rays_sum = 0
    best = None
    for wdw in range(max(best_of, 1)):
        dt, rays, _ = _time_samples(
            lambda s: inner(scene, cam, key, s, px, py), spp, inner=inner,
            warmup=1 + wdw * spp, ctx=ctx, batch=batch)
        dt_sum += dt
        rays_sum += rays
        if best is None or rays / dt > best[0] / best[1]:
            best = (rays, dt)
    rays, dt = best
    mrays = rays / dt / 1e6
    result = {
        "metric": metric, "value": round(mrays, 3), "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "spp_per_s": round(spp / dt, 4), "rays": rays,
        "seconds": round(dt, 3),
    }
    if best_of > 1:
        result["windows"] = best_of
        result["mean_mrays"] = round(rays_sum / dt_sum / 1e6, 3)
    result.update(extra or {})
    return result


def bench_mega(scene, cam, key, px, py, spp, width, metric, *, max_depth=8,
               extra=None, batch=1, best_of=1):
    from cudapathtracer_tpu.models import unidirectional_mega

    def inner(sc, c, k, s, ipx, ipy):
        return unidirectional_mega.render_sample(
            sc, c, k, s, ipx, ipy, max_depth=max_depth,
            width=min(width, int(ipx.shape[0])), grid_w=c.width)

    return bench_inner(inner, (scene, cam, key, px, py), spp, metric,
                       extra=extra, batch=batch, best_of=best_of)


class Deadline:
    """Wall-clock budget tracker: lines are skipped (and counted) once the
    budget is spent, instead of the process dying mid-suite."""

    def __init__(self, seconds):
        self.seconds = seconds
        self.skipped = []

    def remaining(self):
        return self.seconds - _elapsed()

    def allow(self, name, est_s=120.0):
        """True if `name` (estimated cost est_s) still fits the budget."""
        if self.remaining() >= est_s:
            return True
        self.skipped.append(name)
        return False


def _guarded(deadline, name, est_s, fn):
    """Run one bench line under the deadline with exception containment;
    emits the line on success, a bench-error line on failure."""
    if not deadline.allow(name, est_s):
        return
    try:
        result = fn()
        if result is not None:
            _emit(result)
    except Exception as e:  # one bad line must not kill the suite
        traceback.print_exc(file=sys.stderr)
        _emit({"metric": name, "value": 0, "unit": "error",
               "vs_baseline": 0.0, "error": f"{type(e).__name__}: {e}"})


def _aot_step(inner, ctx, batch):
    """AOT-compile `inner(scene,cam,key,s,px,py)` (batched device-side when
    batch > 1 — models/batch.py, bit-identical) WITHOUT executing it.

    Returns step(s0) -> (li, rays, ...) advancing `batch` samples. The
    compile runs wherever the caller is (a background thread, for the
    overlapped suite); the first EXECUTION stays with the measuring
    thread."""
    import jax.numpy as _jnp
    scene, cam, key, px, py = ctx
    if batch > 1:
        from cudapathtracer_tpu.models.batch import make_batched
        bf = make_batched(inner)
        compiled = bf.lower(scene, cam, key, _jnp.int32(0), px, py,
                            k=batch).compile()
    else:
        jf = jax.jit(lambda sc, c, k2, s, ipx, ipy:
                     inner(sc, c, k2, s, ipx, ipy))
        compiled = jf.lower(scene, cam, key, _jnp.int32(0), px,
                            py).compile()
    return lambda s0: compiled(scene, cam, key, _jnp.int32(s0), px, py)


def _measure_aot(step, spp, batch, best_of, metric, *, extra=None,
                 headline_mrays=None):
    """Time a prebuilt AOT step over best_of windows (fastest reported —
    same tunnel-noise discipline as bench_inner)."""
    k = max(batch, 1)
    out = step(0)
    _ = float(out[0].sum())  # first execution: load + warmup barrier
    dt_sum = 0.0
    rays_sum = 0
    ctr_sum = 0  # trailing scalar counter (e.g. VCM merge-cap drops)
    best = None
    acc = None
    saw_ctr = False
    for wdw in range(max(best_of, 1)):
        rtot = 0
        s = 1 + wdw * spp
        end = s + spp
        t0 = time.perf_counter()
        while s < end:
            out = step(s)
            li, rays = out[0], out[1]
            acc = li if acc is None else acc + li
            rtot += int(rays)
            if len(out) > 2:
                ctr_sum += int(out[2])
                saw_ctr = True
            s += k
            _ = float(rays)  # bounded in-flight queue through the tunnel
        img = np.asarray(acc)
        dt = time.perf_counter() - t0
        assert np.isfinite(img).all(), "NaN/Inf in benchmark render"
        dt_sum += dt
        rays_sum += rtot
        if best is None or rtot / dt > best[0] / best[1]:
            best = (rtot, dt)
    rays, dt = best
    mrays = rays / dt / 1e6
    result = {
        "metric": metric, "value": round(mrays, 3), "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "spp_per_s": round(spp / dt, 4), "rays": rays,
        "seconds": round(dt, 3),
    }
    if best_of > 1:
        result["windows"] = best_of
        result["mean_mrays"] = round(rays_sum / dt_sum / 1e6, 3)
    if headline_mrays:
        # same-hour tunnel-noise anchor: this line relative to THIS run's
        # headline (absolute numbers swing 2-3x hour to hour; the ratio
        # is the round-over-round comparable quantity)
        result["headline_ratio"] = round(mrays / headline_mrays, 4)
    if saw_ctr:
        result["merge_dropped"] = ctr_sum
    result.update(extra or {})
    return result


def run_suite(args, key, deadline, headline_mrays=None):
    """Suite lines with OVERLAPPED COMPILATION (round-4 redesign: round 3
    lost 8 of 16 lines to the deadline, and ~95% of every line's cost was
    its XLA compile, which is local CPU work — so a background thread pool
    AOT-compiles the lines via jit.lower().compile() while the main thread
    measures whichever executable is ready; device execution stays
    exclusively on the main thread). Compiles are submitted in EVIDENTIARY
    priority order (photon family first — the round-over-round regression
    watch), measurement consumes futures as they complete, and the
    deadline skips un-compiled lines instead of dying. BENCH_SERIAL=1
    restores the round-3 serial path."""
    from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
    from cudapathtracer_tpu.models import (bdpt, bdpt_mega, naive,
                                           unidirectional,
                                           unidirectional_mega, vcm,
                                           vcm_mega)
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene

    mats = builtin_materials()
    # suite lines run at small frames where the ~24 ms tunnel dispatch
    # floor + per-sample readback dominate; batch samples into one
    # dispatch (bit-identical — tests/test_batch.py)
    batch = args.batch if args.batch > 0 else min(args.spp, 4)
    # cheap tier: suite lines run ONE timing window by default (their
    # absolute numbers are tunnel-noisy either way; headline_ratio is the
    # comparable quantity) — the HEADLINE and the photon-family lines keep
    # best-of windows (--best-of) as the round's verified records.
    cheap_bo = 1
    photon_bo = max(args.best_of, 1)

    # ---- scenes (native BVH build — cheap, serial) ----
    scene, _ = build_scene(builtin.cornell_with_blocks(), mats)
    scene2, _ = build_scene(builtin.cornell_with_spheres(), mats)
    mesh4 = builtin.cornell_with_bunny(subdivisions=4, bunny_mat=7)
    scene4, _ = build_scene(mesh4, mats)

    w = h = 512
    cam = Camera.pinhole((0.0, 0.0, 1.0), w, h, 0.0, 0.0, 0.0, 60.0)
    px, py = _grid(w, h)
    ws = hs = 256
    cam_s = Camera.pinhole((0.0, 0.0, 1.0), ws, hs, 0.0, 0.0, 0.0, 60.0)
    pxs, pys = _grid(ws, hs)
    spp_s = max(args.spp // 2, 1)
    wr = hr = 800
    cam_r = Camera.pinhole((0.0, 0.0, 1.0), wr, hr, 0.0, 0.0, 0.0, 60.0)
    pxr, pyr = _grid(wr, hr)
    spp_r = max(args.spp // 2, 1)

    def mega_inner(sc, c, k, s, ipx, ipy):
        # width 0 = engine default (MEGA_WIDTH), like bench_mega
        return unidirectional_mega.render_sample(
            sc, c, k, s, ipx, ipy, max_depth=8,
            width=min(args.width, int(ipx.shape[0])), grid_w=c.width)

    vcfg = vcm.VCMConfig(eye_depth=6, light_depth=4)
    scfg = vcm.VCMConfig(eye_depth=6, light_depth=4, light_trace=False,
                         nee=False, naive=False, connection=False,
                         do_mis=False, do_sppm=True)
    vcfg_r = vcm.VCMConfig(eye_depth=16, light_depth=10)
    bcfg = bdpt.BDPTConfig(eye_depth=6, light_depth=4)
    sw = min(args.width, ws * hs)  # 0 = engine default

    # (name, spp, batch, best_of, inner, ctx, extra) — priority order
    specs = [
        # best-of-2 windows (round 5: the suite finishes in ~9 min of
        # the 20-min budget, and config6's s_per_sample is the round's
        # <5 evidence — one window was too noisy; 3 would cost ~24 s
        # more device time for little over 2)
        ("config6 reference-shipped VCM 800x800 eye16/light10 mega",
         spp_r, 1, min(photon_bo, 2),
         lambda sc, c, k, s, ipx, ipy: vcm_mega.render_sample(
             sc, c, k, s, ipx, ipy, cfg=vcfg_r, grid_w=wr,
             count_merge_dropped=True),
         (scene, cam_r, key, pxr, pyr), "s_per_sample"),
        ("integrator vcm-mega 256x256 Cornell", spp_s,
         min(batch, spp_s), photon_bo,
         lambda sc, c, k, s, ipx, ipy: vcm_mega.render_sample(
             sc, c, k, s, ipx, ipy, cfg=vcfg, width=sw, grid_w=ws),
         (scene, cam_s, key, pxs, pys), None),
        ("integrator sppm-mega 256x256 Cornell", spp_s,
         min(batch, spp_s), photon_bo,
         lambda sc, c, k, s, ipx, ipy: vcm_mega.render_sample(
             sc, c, k, s, ipx, ipy, cfg=scfg, width=sw, grid_w=ws),
         (scene, cam_s, key, pxs, pys), None),
        ("config1 Cornell 512x512 mega", args.spp, batch, cheap_bo,
         mega_inner, (scene, cam, key, px, py), None),
        ("config2 specular mirror+glass 512x512 mega", args.spp, batch,
         cheap_bo, mega_inner, (scene2, cam, key, px, py), None),
        (f"config4 NEE+GGX steel mesh({mesh4.num_triangles}) 512x512 mega",
         args.spp, batch, cheap_bo, mega_inner,
         (scene4, cam, key, px, py), None),
        ("integrator vcm 256x256 Cornell", spp_s, min(batch, spp_s),
         cheap_bo,
         lambda sc, c, k, s, ipx, ipy: vcm.render_sample(
             sc, c, k, s, ipx, ipy, cfg=vcfg),
         (scene, cam_s, key, pxs, pys), None),
        ("integrator sppm 256x256 Cornell", spp_s, min(batch, spp_s),
         cheap_bo,
         lambda sc, c, k, s, ipx, ipy: vcm.render_sample(
             sc, c, k, s, ipx, ipy, cfg=scfg),
         (scene, cam_s, key, pxs, pys), None),
        ("integrator naive 256x256 Cornell", spp_s, min(batch, spp_s),
         cheap_bo,
         lambda sc, c, k, s, ipx, ipy: naive.render_sample(
             sc, c, k, s, ipx, ipy, max_depth=6),
         (scene, cam_s, key, pxs, pys), None),
        ("integrator unidirectional-classic 256x256 Cornell", spp_s,
         min(batch, spp_s), cheap_bo,
         lambda sc, c, k, s, ipx, ipy: unidirectional.render_sample(
             sc, c, k, s, ipx, ipy, max_depth=6),
         (scene, cam_s, key, pxs, pys), None),
        ("integrator unidirectional-mega 256x256 Cornell", spp_s,
         min(batch, spp_s), cheap_bo,
         lambda sc, c, k, s, ipx, ipy: unidirectional_mega.render_sample(
             sc, c, k, s, ipx, ipy, max_depth=6, width=sw, grid_w=ws),
         (scene, cam_s, key, pxs, pys), None),
        ("integrator bdpt 256x256 Cornell", spp_s, min(batch, spp_s),
         cheap_bo,
         lambda sc, c, k, s, ipx, ipy: bdpt.render_sample(
             sc, c, k, s, ipx, ipy, cfg=bcfg),
         (scene, cam_s, key, pxs, pys), None),
        ("integrator bdpt-mega 256x256 Cornell", spp_s, min(batch, spp_s),
         cheap_bo,
         lambda sc, c, k, s, ipx, ipy: bdpt_mega.render_sample(
             sc, c, k, s, ipx, ipy, cfg=bcfg, width=sw, grid_w=ws),
         (scene, cam_s, key, pxs, pys), None),
    ]
    if args.skip_suite_slow:
        slow = ("vcm", "sppm", "bdpt", "config6")
        specs = [s for s in specs if not any(t in s[0] for t in slow)]

    # ---- BASELINE config 5: multi-chip — virtual 8-device CPU mesh dryrun
    # (correctness stand-in; real multi-chip hardware is not attached).
    # Runs as a BACKGROUND SUBPROCESS, but started only AFTER the compile
    # pool drains: it shares this 1-core host with the AOT compile
    # workers, and starting it up front measured 787 s of contention in
    # round 4 vs ~40-50 s solo with the persistent compile cache warm
    # (round-4 verdict weak #5). During the clean measurement phase the
    # CPU is idle (TPU-bound), so that's where its 40-50 s lands.
    c5 = {"proc": None, "t0": None}

    def start_c5():
        if c5["proc"] is None:
            c5["t0"] = time.perf_counter()
            c5["proc"] = subprocess.Popen(
                [sys.executable, "-c",
                 "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env={**os.environ, "JAX_PLATFORMS": "cpu",
                     "JAX_PLATFORM_NAME": "cpu"},
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)

    def measure_spec(spec, step):
        name, spp, bat, bo, _inner, _ctx, extra_kind = spec
        result = _measure_aot(step, spp, bat, bo, name,
                              headline_mrays=headline_mrays)
        if extra_kind == "s_per_sample":
            result["s_per_sample"] = round(result["seconds"] / spp, 2)
        return result

    if os.environ.get("BENCH_SERIAL"):
        for spec in specs:
            name, spp, bat, bo, inner, ctx, _x = spec
            _guarded(deadline, name, 90, lambda spec=spec: measure_spec(
                spec, _aot_step(spec[4], spec[5], spec[2])))
        start_c5()
    else:
        # Two-phase measurement: while compiles are in flight, Python
        # tracing on the compile threads holds the GIL and STARVES a
        # concurrent measuring loop (observed: the 256^2 mega line read
        # 0.114 Mrays/s mid-pool vs ~10 clean), so in-pool measurements
        # are emitted as "provisional" insurance (in case the deadline
        # dies before the pool drains) and every line is RE-measured on
        # a quiet machine once all compiles are done — executables are
        # already loaded, so the clean pass costs seconds per line.
        workers = int(os.environ.get("BENCH_COMPILE_WORKERS", "3"))
        pool = ThreadPoolExecutor(max_workers=workers)
        futs = {}
        for spec in specs:
            name = spec[0]
            futs[pool.submit(_aot_step, spec[4], spec[5], spec[2])] = spec
        pending = set(futs)
        ready = {}  # spec name -> (spec, step)
        try:
            while pending:
                budget = deadline.remaining() - 45.0
                if budget <= 0:
                    break
                done, pending = wait(pending, timeout=budget,
                                     return_when=FIRST_COMPLETED)
                if not done:
                    break
                for fut in done:
                    spec = futs[fut]
                    name = spec[0]
                    try:
                        step = fut.result()
                    except Exception as e:
                        traceback.print_exc(file=sys.stderr)
                        _emit({"metric": name, "value": 0, "unit": "error",
                               "vs_baseline": 0.0,
                               "error": f"{type(e).__name__}: {e}"})
                        continue
                    ready[name] = (spec, step)
                    if deadline.allow(f"{name} (provisional)", est_s=15.0):
                        try:
                            prov = _measure_aot(
                                step, spec[1], spec[2], 1, name,
                                headline_mrays=headline_mrays)
                            prov["provisional"] = True
                            _emit(prov)
                        except Exception as e:
                            traceback.print_exc(file=sys.stderr)
        finally:
            for spec in (futs[f] for f in pending):
                deadline.skipped.append(spec[0])
            pool.shutdown(wait=False, cancel_futures=True)
        start_c5()
        # clean pass, priority order, full best-of windows
        for spec in specs:
            name = spec[0]
            if name not in ready:
                continue
            if not deadline.allow(name, est_s=20.0):
                continue
            try:
                _emit(measure_spec(*ready[name]))
            except Exception as e:
                traceback.print_exc(file=sys.stderr)
                _emit({"metric": name, "value": 0, "unit": "error",
                       "vs_baseline": 0.0,
                       "error": f"{type(e).__name__}: {e}"})

    def line_config5():
        start_c5()   # fallback: deadline cut the phase that starts it
        budget = max(deadline.remaining() - 20, 10)
        proc_c5 = c5["proc"]
        try:
            _, err = proc_c5.communicate(timeout=budget)
            rc = proc_c5.returncode
            if rc != 0:
                sys.stderr.write(err.decode(errors="replace")[-2000:])
        except subprocess.TimeoutExpired:
            proc_c5.kill()
            proc_c5.communicate()
            rc = -1
        return {"metric": "config5 multichip dryrun 8-device virtual mesh",
                "value": 8 if rc == 0 else 0, "unit": "devices_ok",
                "vs_baseline": 1.0 if rc == 0 else 0.0,
                "seconds": round(time.perf_counter() - c5["t0"], 1)}
    _guarded(deadline, "config5 multichip dryrun", 15, line_config5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="256x256 headline quick mode (CI/CPU)")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the suite, emit only the 1080p headline")
    ap.add_argument("--skip-suite-slow", action="store_true",
                    help="skip the BDPT/VCM/SPPM integrator benches")
    ap.add_argument("--classic", action="store_true",
                    help="classic per-bounce wavefront for the headline")
    ap.add_argument("--width", type=int, default=0,
                    help="mega wavefront lane count; 0 = engine default "
                         "(models/unidirectional_mega.MEGA_WIDTH, the v5e "
                         "sweep optimum)")
    ap.add_argument("--best-of", type=int, default=3,
                    help="timing windows per line; the fastest is reported "
                         "(guards against shared-tunnel congestion — the "
                         "same code measures 2-3x apart hour to hour)")
    ap.add_argument("--batch", type=int, default=0,
                    help="samples per device dispatch for the suite lines "
                         "(0 = auto: min(spp, 4)); amortizes the ~24 ms "
                         "tunnel dispatch floor at small frames")
    ap.add_argument("--deadline-s", type=float,
                    default=float(os.environ.get("BENCH_DEADLINE_S", 1200)),
                    help="wall-clock budget; once spent, remaining suite "
                         "lines are skipped (not errors) and the run still "
                         "exits 0 with the headline captured")
    args = ap.parse_args()
    deadline = Deadline(args.deadline_s)

    # pay the remote-tunnel first-transfer initialization outside the timers
    _ = float(jnp.zeros((8,)).sum())

    from cudapathtracer_tpu.models import unidirectional
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.camera import Camera
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.utils import rng

    key = rng.base_key()

    # ---- headline: BASELINE config 3 (1080p Cornell + mesh) ----
    # Measured first (fresh device/tunnel state — the suite's dozens of
    # compiled executables degrade a subsequent headline run by ~30%) AND
    # emitted first (so a later timeout can never lose it), then re-emitted
    # as the final line for tail parsers.
    if args.small:
        w, h, subdiv = 256, 256, 4
    else:
        w, h, subdiv = 1920, 1080, 6  # ~82k tris

    # pay the one-time device-upload/ctypes/utility-jit initialization —
    # including the tunnel's per-shape transfer setup (~15-50 ms per NEW
    # leaf shape, measured round 4) — on a throwaway build of the SAME
    # scene, so scene_build_s reports the WARM build the round-2 target
    # ("<0.5 s warm at 82k tris") asks about. Cold-process first build
    # of this scene measures ~0.46-1.1 s depending on tunnel state.
    _ = build_scene(builtin.cornell_with_blocks(), builtin_materials())
    _ = build_scene(builtin.cornell_with_bunny(subdivisions=subdiv),
                    builtin_materials())

    t0 = time.perf_counter()
    mesh = builtin.cornell_with_bunny(subdivisions=subdiv)
    scene, _ = build_scene(mesh, builtin_materials())
    t_scene = time.perf_counter() - t0
    cam = Camera.pinhole((0.0, 0.0, 1.0), w, h, 0.0, 0.0, 0.0, 60.0)
    px, py = _grid(w, h)

    if args.classic:
        nchunks = 20 if not args.small else 1
        csz = px.shape[0] // nchunks
        pxc = [px[i * csz:(i + 1) * csz] for i in range(nchunks)]
        pyc = [py[i * csz:(i + 1) * csz] for i in range(nchunks)]

        li, rays = unidirectional.render_sample(scene, cam, key, 0, pxc[0],
                                                pyc[0], max_depth=8)
        _ = float(li.sum())
        rtot = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        for s in range(1, 1 + args.spp):
            for c in range(nchunks):
                li, rays = unidirectional.render_sample(
                    scene, cam, key, s, pxc[c], pyc[c], max_depth=8)
                rtot = rtot + rays
                _ = float(rays)
        total_rays = int(rtot)
        dt = time.perf_counter() - t0
        result = {"rays": total_rays, "seconds": round(dt, 3)}
        mrays = total_rays / dt / 1e6
        result.update({
            "metric": f"Mrays/s unidirectional-classic {w}x{h} "
                      f"Cornell+mesh({mesh.num_triangles} tris)",
            "value": round(mrays, 3), "unit": "Mrays/s",
            "vs_baseline": round(mrays / TARGET_MRAYS, 4),
            "spp_per_s": round(args.spp / dt, 4)})
    else:
        result = bench_mega(
            scene, cam, key, px, py, args.spp, args.width,
            f"Mrays/s unidirectional {w}x{h} "
            f"Cornell+mesh({mesh.num_triangles} tris)",
            best_of=args.best_of)

    result["scene_build_s"] = round(t_scene, 3)
    result["device"] = str(jax.devices()[0])
    _emit(result)  # the round's north-star number: out the door immediately

    if not (args.small or args.headline_only):
        run_suite(args, key, deadline,
                  headline_mrays=result.get("value") or None)

    # re-emit the headline as the FINAL line so tail parsers (the driver
    # records the last JSON line) see the north-star metric
    final = dict(result)
    final["reemit"] = True
    if deadline.skipped:
        final["suite_skipped"] = deadline.skipped
    final["bench_wall_s"] = round(_elapsed(), 1)
    _emit(final)
    return 0


if __name__ == "__main__":
    sys.exit(main())
