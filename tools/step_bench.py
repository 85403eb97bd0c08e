#!/usr/bin/env python
"""Decompose the fused traversal step cost: time each stage of
ops/traverse8.make_fused_step in isolation (chained x8 inside one jit so
dispatch overhead amortizes)."""

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
CH = 8
REPS = 10


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS / CH


def main():
    print("device:", jax.devices()[0], " N =", N)
    scene, _ = build_scene(builtin.cornell_with_bunny(6), builtin_materials())
    table = scene.bvh8_table
    R = table.shape[0]
    lt = getattr(scene, "bvh8_leaf_tris", 4)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, R)
    o = jnp.zeros((N, 3)) + jnp.array([0.0, 0.0, 1.0])
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    inv_d = safe_inv_dir(d)
    t_cut = jnp.full((N,), BIG_T)
    is_node = jnp.ones((N,), bool)
    skip = jnp.full((N,), -1, jnp.int32)
    stack = jnp.zeros((t8.STACK_D, N), jnp.int32)
    top = jnp.zeros((N,), jnp.int32)

    def chain(i, extra):
        """Derive a new index from any array to keep the chain dependent."""
        v = jnp.asarray(extra).ravel()[:N]
        return (i + v.astype(jnp.int32) % 7 + 1) % R

    oT, dT, inv_dT = o.T, d.T, inv_d.T

    @jax.jit
    def node_stage_only(i):
        for _ in range(CH):
            rowT = table[i].T
            direct, deferred, count = t8._node_stage(rowT, oT, inv_dT,
                                                     t_cut, is_node)
            i = chain(i, direct + count)
        return i
    print(f"node_stage (gather+slab+sort): {timeit(node_stage_only, idx)*1e6:8.1f} us")

    @jax.jit
    def leaf_only(i):
        tb, tri, u, v_ = t_cut, jnp.full((N,), -1, jnp.int32), \
            jnp.zeros((N,)), jnp.zeros((N,))
        for _ in range(CH):
            rowT = table[i].T
            tt, uu, vv, ok, tid, raw = t8._leaf_tris(rowT, oT, dT, tb, skip,
                                                     is_node, lt)
            tb, tri, u, v_ = t8._leaf_closest(tt, uu, vv, ok, tid, tb, tri,
                                              u, v_)
            i = chain(i, tri)
        return i
    print(f"leaf (gather+MT+fold):         {timeit(leaf_only, idx)*1e6:8.1f} us")

    @jax.jit
    def stack_only(i):
        s, t_ = stack, top
        deferred = [jnp.where(is_node, i + k, -1) for k in range(7)]
        for k in range(CH):
            cnt = (i + k) % 7
            s, t_, lost = t8._push_block(s, t_, deferred, cnt)
            e, s, t_ = t8._pop(s, t_, is_node)
            i = chain(i, e + t_)
        return i
    print(f"stack (push_block+pop):        {timeit(stack_only, idx)*1e6:8.1f} us")

    fstep = t8.make_fused_step(scene)
    ts0 = t8.trav_start(t8.trav_idle(N), jnp.ones((N,), bool),
                        jnp.full((N,), BIG_T))
    is_shadow = jnp.zeros((N,), bool)

    @jax.jit
    def full_step(ts):
        for _ in range(CH):
            ts = fstep(ts, o, d, inv_d, skip, is_shadow)
        return ts
    print(f"full fused step:               {timeit(full_step, ts0)*1e6:8.1f} us")


if __name__ == "__main__":
    main()
