#!/usr/bin/env python
"""Clean per-stage cost attribution for the fused traversal step: every
array passed as a jit ARG (captured constants poison remote-tunnel timing),
data-independent chains, marginal cost between x8 and x24 unrolls."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.ops import traverse8 as t8
from cudapathtracer_tpu.ops.intersect import BIG_T, safe_inv_dir
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene

N = 103680
REPS = 10


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def marginal(make, *args):
    """Run make(n)(*args) at n=8 and n=24; return marginal us/step."""
    t8_ = timed(make(8), *args)
    t24 = timed(make(24), *args)
    return (t24 - t8_) / 16


def main():
    print("device:", jax.devices()[0], " N =", N)
    scene, _ = build_scene(builtin.cornell_with_bunny(6), builtin_materials())
    R = scene.bvh8_table.shape[0]
    lt = getattr(scene, "bvh8_leaf_tris", 4)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, R)
    o = jnp.zeros((N, 3)) + jnp.array([0.0, 0.0, 1.0])
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    oT, dT, inv_dT = o.T, d.T, safe_inv_dir(d).T
    t_cut = jnp.full((N,), BIG_T)
    is_node = jnp.ones((N,), bool)
    skip = jnp.full((N,), -1, jnp.int32)
    stack = jnp.zeros((t8.STACK_D, N), jnp.int32)
    top = jnp.zeros((N,), jnp.int32)
    count0 = jax.random.randint(key, (N,), 0, 8)
    want = jax.random.randint(key, (N,), 0, 2) > 0

    def chain(i, extra):
        return (i + extra.astype(jnp.int32) % 7 + 1) % R

    # ---- gather+transpose alone ----
    def mk_gather(n):
        @jax.jit
        def f(table, i):
            for _ in range(n):
                rowT = table[i].T
                i = chain(i, rowT[0] + rowT[63])
            return i
        return f
    print(f"gather+T      : {marginal(mk_gather, scene.bvh8_table, idx)*1e6:7.1f} us/step")

    # ---- node stage (incl. gather) ----
    def mk_node(n):
        @jax.jit
        def f(table, i, oT, inv_dT, t_cut, is_node):
            for _ in range(n):
                rowT = table[i].T
                direct, deferred, cnt = t8._node_stage(rowT, oT, inv_dT,
                                                       t_cut, is_node)
                i = chain(i, direct + cnt + deferred[0])
            return i
        return f
    print(f"node (w/ gth) : {marginal(mk_node, scene.bvh8_table, idx, oT, inv_dT, t_cut, is_node)*1e6:7.1f} us/step")

    # ---- leaf stage (incl. gather) ----
    def mk_leaf(n):
        @jax.jit
        def f(table, i, oT, dT, t_cut, skip, is_node):
            tb = t_cut
            tri = jnp.full((N,), -1, jnp.int32)
            u = jnp.zeros((N,))
            v = jnp.zeros((N,))
            for _ in range(n):
                rowT = table[i].T
                tt, uu, vv, ok, tid, raw = t8._leaf_tris(
                    rowT, oT, dT, tb, skip, is_node, lt)
                tb, tri, u, v = t8._leaf_closest(tt, uu, vv, ok, tid, tb,
                                                 tri, u, v)
                i = chain(i, tri)
            return i, tb
        return f
    print(f"leaf (w/ gth) : {marginal(mk_leaf, scene.bvh8_table, idx, oT, dT, t_cut, skip, is_node)*1e6:7.1f} us/step")

    # ---- stack ops alone ----
    def mk_stack(n):
        @jax.jit
        def f(s, t, cnt, want, deferred):
            for _ in range(n):
                e, s, t = t8._pop(s, t, want)
                s, t, lost = t8._push_block(s, t, deferred, cnt)
                cnt = (cnt + e) % 8
            return s, t
        return f
    deferred = [jax.random.randint(key, (N,), 0, 1000) for _ in range(7)]
    print(f"stack pop+push: {marginal(mk_stack, stack, top, count0, want, deferred)*1e6:7.1f} us/step")

    # ---- full fused step (reference point) ----
    def mk_full(n):
        @functools.partial(jax.jit, static_argnames=())
        def f(scene, ts, o, d, inv_d, skip, is_shadow):
            fstep = t8.make_fused_step(scene)
            for _ in range(n):
                ts = fstep(ts, o, d, inv_d, skip, is_shadow)
            return ts
        return f
    ts0 = t8.trav_start(t8.trav_idle(N), jnp.ones((N,), bool),
                        jnp.full((N,), BIG_T))
    is_shadow = jnp.zeros((N,), bool)
    print(f"FULL step     : {marginal(mk_full, scene, ts0, o, d, safe_inv_dir(d), skip, is_shadow)*1e6:7.1f} us/step")


if __name__ == "__main__":
    main()
