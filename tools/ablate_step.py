#!/usr/bin/env python
"""Ablation timing of the fused traversal step: knock out one stage at a
time to attribute the per-step cost. Uses the library's lane-major helpers
directly; each variant is a hand-assembled step."""

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
    lt = getattr(scene, "bvh8_leaf_tris", 4)
    leaf_bit = jnp.int32(1 << 30)
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((N, 3)) + jnp.array([0.0, 0.0, 1.0])
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    oT, dT, inv_dT = o.T, d.T, safe_inv_dir(d).T
    skip = jnp.full((N,), -1, jnp.int32)
    is_shadow = jnp.zeros((N,), bool)
    ts0 = t8.trav_start(t8.trav_idle(N), jnp.ones((N,), bool),
                        jnp.full((N,), BIG_T))

    def make_step(do_node=True, do_leaf=True, do_stack=True, do_gather=True,
                  stack_d=t8.STACK_D):
        def step(ts):
            (flag, direct, stack, top, lostc, t_cut, tri, u, v, scale) = ts
            stack = stack[:stack_d]
            use_direct = direct >= 0
            if do_stack:
                popped, stack, top = t8._pop(stack, top, ~use_direct)
            else:
                popped = jnp.where(top > 0, stack[0], -1)
            entry = jnp.where(use_direct, direct, popped)
            valid = entry >= 0
            is_leaf = valid & ((entry & leaf_bit) != 0)
            is_node = valid & ~is_leaf
            rowid = jnp.where(valid, entry & ~leaf_bit, 0)
            if do_gather:
                rowT = table[rowid].T
            else:
                rowT = jnp.broadcast_to(table[0][:, None], (64, N)) \
                    + rowid.astype(jnp.float32)[None, :] * 0.0
            if do_node:
                new_direct, deferred, kpush = t8._node_stage(
                    rowT, oT, inv_dT, t_cut, is_node)
            else:
                new_direct = jnp.where(is_node, entry + 1, -1)
                deferred = [jnp.full((N,), -1, jnp.int32)] * 7
                kpush = (entry & 3)
            if do_stack:
                stack, top, lost = t8._push_block(stack, top, deferred,
                                                  kpush)
                lostc = jnp.where(lost, lostc | 1, lostc)
            if do_leaf:
                tt, uu, vv, ok, tid, raw = t8._leaf_tris(
                    rowT, oT, dT, t_cut, skip, is_leaf, lt)
                t_cut, tri, u, v = t8._leaf_closest(tt, uu, vv, ok, tid,
                                                    t_cut, tri, u, v)
            direct = new_direct
            drained = (direct < 0) & (top <= 0)
            restarts = lostc >> 1
            redo = drained & ((lostc & 1) == 1) & (restarts < t8.MAX_RESTARTS)
            direct = jnp.where(redo, 0, direct)
            lostc = jnp.where(redo, (restarts + 1) << 1, lostc)
            flag = jnp.where((direct >= 0) | (top > 0), 1, -1) \
                .astype(jnp.int32)
            if stack_d < t8.STACK_D:
                stack = jnp.concatenate(
                    [stack, jnp.zeros((t8.STACK_D - stack_d, N),
                                      jnp.int32)], axis=0)
            return t8.TravState(flag, direct, stack, top, lostc, t_cut, tri,
                                u, v, scale)

        @jax.jit
        def run(ts):
            for _ in range(CH):
                ts = step(ts)
            return ts
        return run

    variants = [
        ("full", {}),
        ("no leaf", dict(do_leaf=False)),
        ("no node", dict(do_node=False)),
        ("no stack", dict(do_stack=False)),
        ("no gather", dict(do_gather=False)),
        ("stack_d=12", dict(stack_d=12)),
        ("node+gather only", dict(do_leaf=False, do_stack=False)),
        ("leaf+gather only", dict(do_node=False, do_stack=False)),
        ("stack only", dict(do_node=False, do_leaf=False, do_gather=False)),
    ]
    for name, kw in variants:
        dt = timeit(make_step(**kw), ts0)
        print(f"{name:18s}: {dt*1e6:8.1f} us/step  {dt/N*1e9:5.2f} ns/lane")


if __name__ == "__main__":
    main()
