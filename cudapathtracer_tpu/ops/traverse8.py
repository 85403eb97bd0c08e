"""BVH8 wavefront traversal with a vectorized per-lane stack.

Companion engine to ops/traverse.py (threaded binary): each while-loop step
pops ONE entry per lane, gathers ONE unified 64-float row (scene/bvh8.py),
and either slab-tests all 8 children at once (inner row — hit children are
distance-sorted far-to-near with an odd-even network and pushed, so the
nearest pops first) or Möller-Trumbore-tests up to 4 inline triangles (leaf
row). The stack is [N, D] int32 manipulated with one-hot masks — wide VPU
ops, no per-lane memory indirection.

Per-ray gather count drops ~3-4x vs the binary thread; the gather is the
dominant per-step cost on TPU, so this is the headline Mrays/s engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.ops.intersect import BIG_T, moller_trumbore, safe_inv_dir
from cudapathtracer_tpu.ops.traverse import (Hit, _compacted_while, _i32,
                                             LEAF_MAT_FLAG)
from cudapathtracer_tpu.utils.math import dot, normalize

# Stack depth: with descend-direct traversal (the nearest hit child is
# entered immediately instead of being pushed) the measured worst-case
# occupancy on 82k-tri torture rays is 19. Correctness does NOT depend on
# the constant: an overflowing push marks the lane `lost` and, once its
# stack drains, the lane RESTARTS from the root with its tightened t_best
# (closest-hit) / accumulated scale (shadow), up to MAX_RESTARTS times —
# after which remaining losses would be silent (never observed; each restart
# prunes far harder than the last).
STACK_D = 28
MAX_RESTARTS = 3

# Batcher odd-even merge sort network for 8 elements (19 comparators)
_SORT8 = [(0, 1), (2, 3), (4, 5), (6, 7),
          (0, 2), (1, 3), (4, 6), (5, 7),
          (1, 2), (5, 6),
          (0, 4), (1, 5), (2, 6), (3, 7),
          (2, 4), (3, 5),
          (1, 2), (3, 4), (5, 6)]


def _slab8(row, o, inv_d, t_best):
    """8-wide slab test from the coordinate-grouped row. Returns
    (tmin8 [N,8], hit8 [N,8])."""
    b = row[:, 0:48].reshape(-1, 6, 8)
    t1 = (b[:, 0:3] - o[:, :, None]) * inv_d[:, :, None]   # [N,3,8]
    t2 = (b[:, 3:6] - o[:, :, None]) * inv_d[:, :, None]
    tmin8 = jnp.max(jnp.minimum(t1, t2), axis=1)
    tmax8 = jnp.min(jnp.maximum(t1, t2), axis=1)
    hit8 = (tmax8 >= tmin8) & (tmax8 > 0.0) & (tmin8 < t_best[:, None])
    return tmin8, hit8


def _pop(stack, top):
    """Pop the top entry per lane. Returns (entry [N], stack, top)."""
    has = top > 0
    top2 = jnp.maximum(top - 1, 0)
    oh = jnp.arange(stack.shape[1], dtype=jnp.int32)[None, :] == top2[:, None]
    entry = jnp.sum(jnp.where(oh, stack, 0), axis=1)
    entry = jnp.where(has, entry, -1)
    return entry, stack, jnp.where(has, top2, top)


def _sort_desc(keys, metas, masks):
    """Odd-even network sort of 8 (key, meta, mask) triples, key DESCENDING
    — misses carry -inf keys so all live slots form a prefix and the LAST
    live slot is the nearest."""
    k = list(keys)
    m = list(metas)
    g = list(masks)
    for a, b in _SORT8:
        swap = k[a] < k[b]
        k[a], k[b] = jnp.where(swap, k[b], k[a]), jnp.where(swap, k[a], k[b])
        m[a], m[b] = jnp.where(swap, m[b], m[a]), jnp.where(swap, m[a], m[b])
        g[a], g[b] = jnp.where(swap, g[b], g[a]), jnp.where(swap, g[a], g[b])
    return k, m, g


def _push(stack, top, metas, masks):
    """Sequential masked pushes. Returns (stack, top, lost) where lost marks
    lanes that had to drop an entry (capacity) — callers restart those."""
    slots = jnp.arange(stack.shape[1], dtype=jnp.int32)[None, :]
    lost = jnp.zeros(top.shape, bool)
    for meta, mask in zip(metas, masks):
        can = mask & (top < stack.shape[1])
        lost = lost | (mask & ~can)
        oh = can[:, None] & (slots == top[:, None])
        stack = jnp.where(oh, meta[:, None], stack)
        top = top + can.astype(jnp.int32)
    return stack, top, lost


def closest_hit8(scene, o, d, max_t=None, skip_tri=None, active=None) -> Hit:
    """BVH8 closest-hit traversal; drop-in for traverse.closest_hit."""
    n = o.shape[0]
    if max_t is None:
        max_t = jnp.full((n,), BIG_T, jnp.float32)
    else:
        max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (n,))
    if skip_tri is None:
        skip_tri = jnp.full((n,), -1, jnp.int32)
    inv_d = safe_inv_dir(d)
    table = scene.bvh8_table
    leaf_bit = jnp.int32(1 << 30)

    # descend-direct: `direct` holds the next entry to process without
    # touching the stack; the stack only holds deferred siblings
    direct0 = jnp.zeros((n,), jnp.int32)  # root row = 0
    if active is not None:
        direct0 = jnp.where(active, direct0, -1)
    top0 = jnp.zeros((n,), jnp.int32)
    stack0 = jnp.zeros((n, STACK_D), jnp.int32)

    def step(flag, direct, stack, top, lostc, t_best, tri, u, v, o, d, inv_d,
             skip_tri):
        use_direct = direct >= 0
        popped, stack, top_after = _pop(stack, top)
        entry = jnp.where(use_direct, direct, popped)
        top = jnp.where(use_direct, top, top_after)

        valid = entry >= 0
        is_leaf = valid & ((entry & leaf_bit) != 0)
        is_node = valid & ~is_leaf
        rowid = jnp.where(valid, entry & ~leaf_bit, 0)
        row = table[rowid]                               # THE gather [N,64]

        # ---- inner-node branch: 8-wide slab, sort far->near, descend near
        tmin8, hit8 = _slab8(row, o, inv_d, t_best)
        meta8 = _i32(row[:, 48:56])
        neg_inf = jnp.float32(-jnp.inf)
        keys, metas, masks = [], [], []
        for i in range(8):
            mi = meta8[:, i]
            gi = is_node & hit8[:, i] & (mi != -1)
            keys.append(jnp.where(gi, tmin8[:, i], neg_inf))
            metas.append(mi)
            masks.append(gi)
        k, m, g = _sort_desc(keys, metas, masks)
        # nearest = last live slot; it becomes `direct`, the rest are pushed
        new_direct = jnp.full_like(direct, -1)
        for i in range(8):
            new_direct = jnp.where(g[i], m[i], new_direct)
        rest_after = jnp.zeros_like(g[7])
        push_masks = [None] * 8
        for i in range(7, -1, -1):
            push_masks[i] = g[i] & rest_after
            rest_after = rest_after | g[i]
        stack, top, lost = _push(stack, top, m[:7], push_masks[:7])
        # encode pending loss in lostc's low bit; restarts in higher bits
        lostc = jnp.where(lost, lostc | 1, lostc)

        # ---- leaf branch: up to 4 inline triangle tests
        tris = row[:, 0:36].reshape(-1, 4, 3, 3)
        ids = _i32(row[:, 36:40])
        for kk in range(4):
            tt, uu, vv, ok = moller_trumbore(o, d, tris[:, kk, 0],
                                             tris[:, kk, 1], tris[:, kk, 2])
            rawid = ids[:, kk]
            tid = jnp.where(rawid < 0, -1, rawid & ~LEAF_MAT_FLAG)
            ok = ok & is_leaf & (tid >= 0) & (tt < t_best) & (tid != skip_tri)
            t_best = jnp.where(ok, tt, t_best)
            tri = jnp.where(ok, tid, tri)
            u = jnp.where(ok, uu, u)
            v = jnp.where(ok, vv, v)

        direct = new_direct
        # drained with a pending loss -> restart from the root (t_best kept,
        # so the retraversal prunes hard); bounded by MAX_RESTARTS
        drained = (direct < 0) & (top <= 0)
        restarts = lostc >> 1
        redo = drained & ((lostc & 1) == 1) & (restarts < MAX_RESTARTS)
        direct = jnp.where(redo, 0, direct)
        lostc = jnp.where(redo, (restarts + 1) << 1, lostc)
        flag = jnp.where((direct >= 0) | (top > 0), 1, -1).astype(jnp.int32)
        return (flag, direct, stack, top, lostc, t_best, tri, u, v, o, d,
                inv_d, skip_tri)

    init = (jnp.where(direct0 >= 0, 1, -1).astype(jnp.int32), direct0,
            stack0, top0, jnp.zeros((n,), jnp.int32),
            max_t, jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
            o, d, inv_d, skip_tri)
    out = _compacted_while(step, init, n)
    return Hit(t=out[5], tri=out[6], u=out[7], v=out[8])


def shadow_factor8(scene, o, d, max_t, skip_tri=None, active=None):
    """BVH8 any-hit shadow traversal with MAT_LEAF transmission; drop-in for
    traverse.shadow_factor."""
    n = o.shape[0]
    max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (n,))
    if skip_tri is None:
        skip_tri = jnp.full((n,), -1, jnp.int32)
    inv_d = safe_inv_dir(d)
    table = scene.bvh8_table
    with_leaf = scene.has_leaf_materials
    leaf_bit = jnp.int32(1 << 30)

    direct0 = jnp.zeros((n,), jnp.int32)
    if active is not None:
        direct0 = jnp.where(active, direct0, -1)
    top0 = jnp.zeros((n,), jnp.int32)
    stack0 = jnp.zeros((n, STACK_D), jnp.int32)

    def step(flag, direct, stack, top, lostc, scale, o, d, inv_d, max_t,
             skip_tri):
        use_direct = direct >= 0
        popped, stack, top_after = _pop(stack, top)
        entry = jnp.where(use_direct, direct, popped)
        top = jnp.where(use_direct, top, top_after)

        valid = entry >= 0
        is_leaf = valid & ((entry & leaf_bit) != 0)
        is_node = valid & ~is_leaf
        rowid = jnp.where(valid, entry & ~leaf_bit, 0)
        row = table[rowid]

        tmin8, hit8 = _slab8(row, o, inv_d, max_t)
        meta8 = _i32(row[:, 48:56])
        metas, masks = [], []
        for i in range(8):
            mi = meta8[:, i]
            gi = is_node & hit8[:, i] & (mi != -1)
            metas.append(mi)
            masks.append(gi)
        # any-hit: order irrelevant — descend the first hit child, push rest
        new_direct = jnp.full_like(direct, -1)
        for i in range(7, -1, -1):
            new_direct = jnp.where(masks[i], metas[i], new_direct)
        seen = jnp.zeros_like(masks[0])
        push_masks = []
        for i in range(8):
            push_masks.append(masks[i] & seen)
            seen = seen | masks[i]
        stack, top, lost = _push(stack, top, metas[1:], push_masks[1:])
        lostc = jnp.where(lost, lostc | 1, lostc)

        tris = row[:, 0:36].reshape(-1, 4, 3, 3)
        ids = _i32(row[:, 36:40])
        blocked = jnp.zeros_like(entry, dtype=bool)
        for k in range(4):
            tt, uu, vv, ok = moller_trumbore(o, d, tris[:, k, 0],
                                             tris[:, k, 1], tris[:, k, 2])
            raw = ids[:, k]
            tid = jnp.where(raw < 0, -1, raw & ~LEAF_MAT_FLAG)
            ok = ok & is_leaf & ~blocked & (tid >= 0) & (tt < max_t) \
                & (tid != skip_tri)
            if with_leaf:
                is_leaf_mat = (raw >= 0) & ((raw & LEAF_MAT_FLAG) != 0)
                srow = scene.tri_shadow[jnp.maximum(tid, 0)]
                n3 = srow[:, 0:9].reshape(-1, 3, 3)
                mat4 = srow[:, 9:13].reshape(-1, 4)
                ior = srow[:, 13]
                w0 = 1.0 - uu - vv
                nrm = normalize(n3[:, 0] * w0[:, None]
                                + n3[:, 1] * uu[:, None]
                                + n3[:, 2] * vv[:, None])
                cos_t = jnp.abs(dot(d, nrm))
                r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
                fres = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
                leaf_scale = (mat4[:, 0:3] * mat4[:, 3:4]
                              * (1.0 - fres)[:, None])
                pass_leaf = ok & is_leaf_mat
                scale = jnp.where(pass_leaf[:, None], scale * leaf_scale,
                                  scale)
                opaque = ok & ~is_leaf_mat
                dark = jnp.max(scale, axis=-1) < 0.01
                blocked = blocked | opaque | (pass_leaf & dark)
            else:
                blocked = blocked | ok
            scale = jnp.where(blocked[:, None], 0.0, scale)

        direct = new_direct
        top = jnp.where(blocked, 0, top)
        direct = jnp.where(blocked, -1, direct)
        lostc = jnp.where(blocked, 0, lostc)  # occlusion is final
        # restart lost, unblocked lanes from the root with scale reset to 1
        # (leaf transmission re-accumulates from scratch — idempotent)
        drained = (direct < 0) & (top <= 0)
        restarts = lostc >> 1
        redo = drained & ((lostc & 1) == 1) & (restarts < MAX_RESTARTS)
        direct = jnp.where(redo, 0, direct)
        scale = jnp.where(redo[:, None], 1.0, scale)
        lostc = jnp.where(redo, (restarts + 1) << 1, lostc)
        flag = jnp.where((direct >= 0) | (top > 0), 1, -1).astype(jnp.int32)
        return (flag, direct, stack, top, lostc, scale, o, d, inv_d, max_t,
                skip_tri)

    init = (jnp.where(direct0 >= 0, 1, -1).astype(jnp.int32), direct0,
            stack0, top0, jnp.zeros((n,), jnp.int32),
            jnp.ones((n, 3), jnp.float32), o, d, inv_d, max_t, skip_tri)
    out = _compacted_while(step, init, n)
    return out[5]
