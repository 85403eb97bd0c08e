#!/usr/bin/env python
"""Fused-traversal-step cost attribution by stage: monkey-patch one stage
of ops/traverse8 to a stub, time a long while-loop of steps, and compare
us/step against baseline (results are WRONG traversals — cost only).

Marginal cost comes from the iters=128 vs iters=64 subtraction so the
~24 ms tunnel dispatch floor cancels. Run ONE mode per process.

Usage: python tools/t8_ablate.py [baseline|noleaf|nosort|nostack|nogather|
                                  noslab] [width]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))  # warm-compile reruns (see bench.py note)

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.ops import traverse8 as t8
from cudapathtracer_tpu.ops.intersect import BIG_T, safe_inv_dir

mode = sys.argv[1] if len(sys.argv) > 1 else "baseline"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 12960
SPI = 12

if mode == "noleaf":
    _orig_lt = t8._leaf_tris

    def _lt_off(rowT, oT, dT, t_cut, skip_tri, is_leaf, lt):
        z = jnp.zeros_like(t_cut)
        f = jnp.zeros_like(is_leaf)
        raw = t8._i32(rowT[t8._TRI_OFF + 9 * lt:t8._TRI_OFF + 10 * lt])
        one = [z] * lt
        return one, one, one, [f] * lt, [raw[j] for j in range(lt)], raw
    t8._leaf_tris = _lt_off
elif mode == "nosort":
    t8._sort8_keys = lambda ks: list(ks)
elif mode == "nostack":
    def _pop_off(stack, top, want):
        return jnp.where(want & (top > 0), stack[0], -1), stack, \
            jnp.where(want & (top > 0), top - 1, top)

    def _push_off(stack, top, deferred, count):
        # keep the data dependency on deferred/count, skip the shifts
        s0 = jnp.where(count > 0, deferred[0], stack[0])
        stack = jnp.concatenate([s0[None, :], stack[1:]], axis=0)
        new_top = jnp.minimum(top + count, stack.shape[0])
        return stack, new_top, new_top > stack.shape[0]
    t8._pop = _pop_off
    t8._push_block = _push_off
elif mode == "noslab":
    _orig_ns = t8._node_stage

    def _ns_off(rowT, oT, inv_dT, t_cut, is_node):
        # keep the key sort + meta reconstruction, stub the slab math
        n = rowT.shape[1]
        base = t8._i32(rowT[48:49])[0]
        slots = jnp.arange(8, dtype=jnp.int32)[:, None]
        key = (t8._i32(rowT[0:8]) & jnp.int32(~15)) | slots
        live = is_node[None, :] & (key != t8._KEY_INVALID)
        key = jnp.where(live, key, jnp.int32(t8._KEY_INVALID))
        ks = t8._sort8_keys([key[i] for i in range(8)])
        metas = []
        count = jnp.zeros_like(base)
        for i, k in enumerate(ks):
            g = k != t8._KEY_INVALID
            meta = (base + (k & 7)) | ((k & 8) << 27)
            metas.append(jnp.where(g, meta, -1))
            if i > 0:
                count = count + g.astype(jnp.int32)
        return metas[0], metas[1:], count
    t8._node_stage = _ns_off


def main():
    from cudapathtracer_tpu.scene import builtin
    from cudapathtracer_tpu.scene.materials import builtin_materials
    from cudapathtracer_tpu.scene.scene import build_scene
    import functools

    print("device:", jax.devices()[0], " N =", N, " mode =", mode)
    scene, _ = build_scene(builtin.cornell_with_bunny(6), builtin_materials())
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((N, 3)) + jnp.array([0.0, 0.0, 1.0])
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    inv_d = safe_inv_dir(d)
    skip = jnp.full((N,), -1, jnp.int32)
    is_shadow = jnp.zeros((N,), bool)
    ts0 = t8.trav_start(t8.trav_idle(N), jnp.ones((N,), bool),
                        jnp.full((N,), BIG_T))

    @functools.partial(jax.jit, static_argnames=("spi",))
    def run_while(scene, ts, o, d, inv_d, skip, is_shadow, iters, spi):
        fstep = t8.make_fused_step(scene)

        def body(c):
            i, ts = c
            # restart drained lanes so the work mix stays steady-state
            ts = t8.trav_start(ts, ts.flag < 0,
                               jnp.full((ts.flag.shape[0],), BIG_T))
            for _ in range(spi):
                ts = fstep(ts, o, d, inv_d, skip, is_shadow)
            return i + 1, ts

        _, ts = jax.lax.while_loop(lambda c: c[0] < iters, body, (0, ts))
        return (ts.t_cut.sum() + ts.tri.sum() + ts.top.sum()
                + ts.flag.sum() + ts.stack.sum() + ts.scale.sum()
                + ts.u.sum() + ts.v.sum() + ts.direct.sum()
                + ts.lostc.sum())

    def timed(iters, reps=5):
        out = run_while(scene, ts0, o, d, inv_d, skip, is_shadow,
                        jnp.int32(iters), SPI)
        _ = float(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run_while(scene, ts0, o, d, inv_d, skip, is_shadow,
                            jnp.int32(iters), SPI)
            _ = float(out)
        return (time.perf_counter() - t0) / reps

    d64 = timed(64)
    d128 = timed(128)
    marg = (d128 - d64) / (64 * SPI)
    print(f"iters64 {d64*1e3:8.1f} ms   iters128 {d128*1e3:8.1f} ms   "
          f"marginal {marg*1e6:7.2f} us/step  {marg/N*1e9:5.2f} ns/lane")


if __name__ == "__main__":
    main()
