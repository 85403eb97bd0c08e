"""BVH8 wavefront traversal with a vectorized per-lane stack.

Companion engine to ops/traverse.py (threaded binary): each while-loop step
pops ONE entry per lane, gathers ONE unified row (scene/bvh8.py CBVH
layout: sibling rows contiguous, child = base + slot), and either
slab-tests all 8 children at once (inner row — a single packed int key per
child is distance-sorted with an odd-even network; the nearest is entered
directly, the rest pushed far->near) or Möller-Trumbore-tests the inline
leaf triangles (leaf row). The stack is [N, D] int32 manipulated with
one-hot masks — wide VPU ops, no per-lane memory indirection.

Per-ray gather count drops ~3-4x vs the binary thread; the gather is the
dominant per-step cost on TPU, so this is the headline Mrays/s engine.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cudapathtracer_tpu.ops.intersect import BIG_T, moller_trumbore, safe_inv_dir
from cudapathtracer_tpu.ops.traverse import (Hit, _compacted_while, _i32,
                                             LEAF_MAT_FLAG)
from cudapathtracer_tpu.utils.math import normalize

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


def _pop(stack, top, want):
    """Pop the top entry on `want` lanes. Returns (entry [N], stack, top).

    Top-at-column-0 discipline: the popped value is a FREE contiguous
    slice and the shift is a contiguous masked copy. (A top-pointer stack
    needs a one-hot reduction over [N,D] per pop, which profiling showed
    costs as much as the row gather itself.) Unlike a pointer bump, the
    shift MUTATES the stack, so the caller must pass the true pop
    condition — lanes that keep their descend-direct entry must not
    shift."""
    has = want & (top > 0)
    entry = jnp.where(has, stack[:, 0], -1)
    shifted = jnp.concatenate([stack[:, 1:], stack[:, :1]], axis=1)
    stack = jnp.where(has[:, None], shifted, stack)
    return entry, stack, jnp.where(has, top - 1, top)


_KEY_INVALID = 0x7FFFFFFF  # sorts last ascending; unreachable by real keys


def _sort8_keys(ks):
    """Odd-even network sort of 8 packed int32 keys, ASCENDING — one
    min/max pair per comparator (the CBVH layout lets metas be
    reconstructed arithmetically after the sort, so only the key array is
    permuted: ~1/3 the network traffic of sorting (key, meta, mask)
    triples, which profiling showed was the largest non-gather cost of a
    traversal step)."""
    ks = list(ks)
    for a, b in _SORT8:
        lo = jnp.minimum(ks[a], ks[b])
        hi = jnp.maximum(ks[a], ks[b])
        ks[a], ks[b] = lo, hi
    return ks


def _child_meta8(row, is_node, hit8):
    """Per-slot child entries of a CBVH node row: child_base + slot, with
    the leaf-row flag in bit 30. Returns (meta8 [N,8] i32, live [N,8])."""
    cb = _i32(row[:, 48:50])
    base, leaf_mask = cb[:, 0], cb[:, 1]
    slots = jnp.arange(8, dtype=jnp.int32)[None, :]
    leaf8 = (leaf_mask[:, None] >> slots) & 1
    meta8 = (base[:, None] + slots) | (leaf8 << 30)
    return meta8, is_node[:, None] & hit8


def _node_stage(row, o, inv_d, t_cut, is_node):
    """Ordered CBVH node stage: slab-test all 8 children, sort a single
    packed key (tmin bits | leaf flag | slot) per slot, reconstruct child
    rows as child_base + slot. Returns (direct — nearest hit child entry or
    -1; deferred — 7 near-first deferred children; count — how many are
    live, for _push_block)."""
    tmin8, hit8 = _slab8(row, o, inv_d, t_cut)
    cb = _i32(row[:, 48:50])
    base, leaf_mask = cb[:, 0], cb[:, 1]
    slots = jnp.arange(8, dtype=jnp.int32)[None, :]
    leaf8 = (leaf_mask[:, None] >> slots) & 1
    # IEEE total-order trick: int bits sort like the float once negative
    # patterns have their low 31 bits flipped — NEGATIVE tmins (boxes
    # straddling the origin, common for secondary rays) must keep their
    # true order: clamping them to 0 measured +20% lockstep iterations.
    # The low 4 bits are recycled for (leaf flag << 3 | slot) — ties within
    # a 16-ulp bucket break arbitrarily, which only affects visit order.
    tb = jax.lax.bitcast_convert_type(tmin8, jnp.int32)
    tb = jnp.where(tb >= 0, tb, tb ^ jnp.int32(0x7FFFFFFF))
    key = (tb & jnp.int32(~15)) | (leaf8 << 3) | slots
    live = is_node[:, None] & hit8
    key = jnp.where(live, key, jnp.int32(_KEY_INVALID))
    ks = _sort8_keys([key[:, i] for i in range(8)])
    metas = []
    count = jnp.zeros_like(base)
    for i, k in enumerate(ks):
        g = k != _KEY_INVALID
        meta = (base + (k & 7)) | ((k & 8) << 27)   # leaf bit 3 -> bit 30
        metas.append(jnp.where(g, meta, -1))
        if i > 0:
            count = count + g.astype(jnp.int32)
    return metas[0], metas[1:], count


def _push_block(stack, top, deferred, count):
    """Push `count[n]` of the (up to 7) NEAR-FIRST `deferred` entries per
    lane in one block: shift the stack right by count via three masked
    power-of-two shifts, then write the new entries into FIXED columns
    0..count-1 — contiguous copies and column writes only, no one-hot
    scatters. Overflow drops the DEEPEST entries (shifted off the end) and
    flags `lost`; callers restart those lanes from the root."""
    d_cols = stack.shape[1]
    for bit in (4, 2, 1):
        m = (count & bit) != 0
        shifted = jnp.concatenate([stack[:, :bit], stack[:, :-bit]], axis=1)
        stack = jnp.where(m[:, None], shifted, stack)
    head = [jnp.where(i < count, deferred[i], stack[:, i]) for i in range(7)]
    stack = jnp.concatenate([jnp.stack(head, axis=1), stack[:, 7:]], axis=1)
    new_top = top + count
    lost = new_top > d_cols
    return stack, jnp.minimum(new_top, d_cols), lost


def _leaf_tris(row, o, d, t_cut, skip_tri, is_leaf, lt):
    """Batched Möller-Trumbore over the row's `lt` inline triangles.

    One [N,lt]-wide evaluation instead of lt narrow per-column passes —
    narrow slices of a gathered row are re-materialized per consumer by
    XLA:TPU (measured ~2x whole-traversal cost), wide ops are not.

    Returns (tt, uu, vv, ok, tid, raw) all [N,lt]."""
    tris = row[:, 0:9 * lt].reshape(-1, lt, 9)
    tt, uu, vv, ok = moller_trumbore(o[:, None, :], d[:, None, :],
                                     tris[..., 0:3], tris[..., 3:6],
                                     tris[..., 6:9])
    raw = _i32(row[:, 9 * lt:10 * lt])
    tid = jnp.where(raw < 0, -1, raw & ~LEAF_MAT_FLAG)
    ok = (ok & is_leaf[:, None] & (tid >= 0) & (tt < t_cut[:, None])
          & (tid != skip_tri[:, None]))
    return tt, uu, vv, ok, tid, raw


def _leaf_closest(tt, uu, vv, ok, tid, t_best, tri, u, v):
    """Fold the row's best triangle hit into (t_best, tri, u, v) via a
    packed-key min (slot index in the low mantissa bits — unique winner,
    no cumsum tie-break pass). Exact t ties resolve to the first slot like
    the sequential reference loop."""
    lt = tt.shape[1]
    slots = jnp.arange(lt, dtype=jnp.int32)[None, :]
    tb = jax.lax.bitcast_convert_type(jnp.maximum(tt, 0.0), jnp.int32)
    mask_bits = jnp.int32(~3) if lt <= 4 else jnp.int32(~15)
    key = jnp.where(ok, (tb & mask_bits) | slots, jnp.int32(_KEY_INVALID))
    kmin = jnp.min(key, axis=1)
    hit = kmin != _KEY_INVALID
    sel = key == kmin[:, None]          # exactly one (slot bits unique)
    pick = lambda a: jnp.sum(jnp.where(sel, a, 0), axis=1)
    t_best = jnp.where(hit, pick(tt), t_best)
    tri = jnp.where(hit, pick(tid), tri)
    u = jnp.where(hit, pick(uu), u)
    v = jnp.where(hit, pick(vv), v)
    return t_best, tri, u, v


def _leaf_shadow(scene, with_leaf, d, tt, uu, vv, ok, tid, raw, row, scale,
                 blocked):
    """Fold the row's triangle occlusions into (scale, blocked) — batched
    across the 4 slots. MAT_LEAF transmissions multiply commutatively; the
    darkness early-out (<0.01) is applied after the row's full product
    (BVHShadowRay applies it per hit in traversal order — same fixpoint,
    the running scale only ever shrinks)."""
    oks = ok & ~blocked[:, None]
    if with_leaf:
        is_leaf_mat = (raw >= 0) & ((raw & LEAF_MAT_FLAG) != 0)
        srow = scene.tri_shadow[jnp.maximum(tid, 0)]        # [N,lt,16]
        n3 = srow[..., 0:9].reshape(-1, tid.shape[1], 3, 3)
        mat4 = srow[..., 9:13]
        ior = srow[..., 13]
        w0 = 1.0 - uu - vv
        nrm = normalize(n3[:, :, 0] * w0[..., None]
                        + n3[:, :, 1] * uu[..., None]
                        + n3[:, :, 2] * vv[..., None])
        cos_t = jnp.abs(jnp.sum(d[:, None, :] * nrm, axis=-1))
        r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
        fres = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
        leaf_scale = mat4[..., 0:3] * mat4[..., 3:4] * (1.0 - fres)[..., None]
        pass_leaf = oks & is_leaf_mat
        factor = jnp.prod(jnp.where(pass_leaf[..., None], leaf_scale, 1.0),
                          axis=1)
        scale = scale * factor
        opaque = jnp.any(oks & ~is_leaf_mat, axis=1)
        dark = jnp.max(scale, axis=-1) < 0.01
        blocked = blocked | opaque | (jnp.any(pass_leaf, axis=1) & dark)
    else:
        blocked = blocked | jnp.any(oks, axis=1)
    scale = jnp.where(blocked[:, None], 0.0, scale)
    return scale, blocked


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
    lt = getattr(scene, 'bvh8_leaf_tris', 4)
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
        popped, stack, top = _pop(stack, top, ~use_direct)
        entry = jnp.where(use_direct, direct, popped)

        valid = entry >= 0
        is_leaf = valid & ((entry & leaf_bit) != 0)
        is_node = valid & ~is_leaf
        rowid = jnp.where(valid, entry & ~leaf_bit, 0)
        # THE gather [N,64]; the barrier pins ONE materialization (XLA:TPU
        # otherwise re-issues the gather per consuming slice, measured +18%)
        row = table[rowid]

        # ---- inner-node branch: packed-key sort, descend nearest,
        # push deferred siblings far->near
        new_direct, deferred, kpush = _node_stage(row, o, inv_d, t_best,
                                                  is_node)
        stack, top, lost = _push_block(stack, top, deferred, kpush)
        # encode pending loss in lostc's low bit; restarts in higher bits
        lostc = jnp.where(lost, lostc | 1, lostc)

        # ---- leaf branch: batched leaf-triangle test (one wide [N,lt] pass)
        tt, uu, vv, ok, tid, _raw = _leaf_tris(row, o, d, t_best, skip_tri,
                                               is_leaf, lt)
        t_best, tri, u, v = _leaf_closest(tt, uu, vv, ok, tid,
                                          t_best, tri, u, v)

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
    lt = getattr(scene, 'bvh8_leaf_tris', 4)
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
        popped, stack, top = _pop(stack, top, ~use_direct)
        entry = jnp.where(use_direct, direct, popped)

        valid = entry >= 0
        is_leaf = valid & ((entry & leaf_bit) != 0)
        is_node = valid & ~is_leaf
        rowid = jnp.where(valid, entry & ~leaf_bit, 0)
        row = table[rowid]

        # ordered stage for any-hit too: the sort is ~38 cheap wide ops
        # and the block push requires the near-first prefix order
        new_direct, deferred, kpush = _node_stage(row, o, inv_d, max_t,
                                                  is_node)
        stack, top, lost = _push_block(stack, top, deferred, kpush)
        lostc = jnp.where(lost, lostc | 1, lostc)

        tt, uu, vv, ok, tid, raw = _leaf_tris(row, o, d, max_t, skip_tri,
                                              is_leaf, lt)
        blocked = jnp.zeros_like(entry, dtype=bool)
        scale, blocked = _leaf_shadow(scene, with_leaf, d, tt, uu, vv, ok,
                                      tid, raw, row, scale, blocked)

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



class TravState(NamedTuple):
    """Per-lane mixed-mode traversal registers (make_fused_step). flag < 0
    means the lane's traversal is drained (or was never started)."""
    flag: jax.Array     # [N] i32: 1 in flight, -1 drained/idle
    direct: jax.Array   # [N] i32 next entry (descend-direct), -1 none
    stack: jax.Array    # [N, STACK_D] i32
    top: jax.Array      # [N] i32
    lostc: jax.Array    # [N] i32 pending-loss bit + restart count
    t_cut: jax.Array    # [N] closest: running t_best; shadow: max_t
    tri: jax.Array      # [N] i32 best hit (closest lanes)
    u: jax.Array        # [N]
    v: jax.Array        # [N]
    scale: jax.Array    # [N,3] shadow transmission product


def trav_idle(n) -> TravState:
    """Idle traversal registers (flag=-1 everywhere)."""
    z = jnp.zeros((n,), jnp.float32)
    return TravState(
        flag=jnp.full((n,), -1, jnp.int32),
        direct=jnp.full((n,), -1, jnp.int32),
        stack=jnp.zeros((n, STACK_D), jnp.int32),
        top=jnp.zeros((n,), jnp.int32),
        lostc=jnp.zeros((n,), jnp.int32),
        t_cut=jnp.full((n,), BIG_T, jnp.float32),
        tri=jnp.full((n,), -1, jnp.int32),
        u=z, v=z,
        scale=jnp.ones((n, 3), jnp.float32))


def trav_start(ts: TravState, mask, t_lim) -> TravState:
    """(Re)start traversal from the root on `mask` lanes with fresh
    registers; t_lim is the initial t_best (closest) / max_t (shadow)."""
    sel = lambda a, b: jnp.where(mask, a, b)
    return TravState(
        flag=sel(1, ts.flag).astype(jnp.int32),
        direct=sel(0, ts.direct).astype(jnp.int32),
        stack=ts.stack,
        top=sel(0, ts.top).astype(jnp.int32),
        lostc=sel(0, ts.lostc).astype(jnp.int32),
        t_cut=sel(t_lim, ts.t_cut),
        tri=sel(-1, ts.tri).astype(jnp.int32),
        u=sel(0.0, ts.u), v=sel(0.0, ts.v),
        scale=jnp.where(mask[:, None], 1.0, ts.scale))


def make_fused_step(scene):
    """Build the one-node-step transition for mixed closest/shadow lanes.

    Returns step(ts, o, d, inv_d, skip_tri, is_shadow) -> TravState. Lanes
    with ts.flag < 0 are no-ops (they still ride the lockstep ops). The
    mega-wavefront integrator embeds this step directly in its path loop;
    trace_fused8 wraps it with the straggler-compacted while."""
    table = scene.bvh8_table
    lt = getattr(scene, 'bvh8_leaf_tris', 4)
    with_leaf = scene.has_leaf_materials
    leaf_bit = jnp.int32(1 << 30)

    def step(ts: TravState, o, d, inv_d, skip_tri, is_shadow) -> TravState:
        (flag, direct, stack, top, lostc, t_cut, tri, u, v, scale) = ts
        use_direct = direct >= 0
        popped, stack, top = _pop(stack, top, ~use_direct)
        entry = jnp.where(use_direct, direct, popped)

        valid = entry >= 0
        is_leaf = valid & ((entry & leaf_bit) != 0)
        is_node = valid & ~is_leaf
        rowid = jnp.where(valid, entry & ~leaf_bit, 0)
        row = table[rowid]  # THE gather [N,64]

        # ---- inner node: closest lanes benefit from the near-first
        # descent order; shadow lanes ride along (order-agnostic)
        new_direct, deferred, kpush = _node_stage(row, o, inv_d, t_cut,
                                                  is_node)
        stack, top, lost = _push_block(stack, top, deferred, kpush)
        lostc = jnp.where(lost, lostc | 1, lostc)

        # ---- leaf: batched leaf-triangle test, mode-split bookkeeping
        tt, uu, vv, ok, tid, raw = _leaf_tris(row, o, d, t_cut, skip_tri,
                                              is_leaf, lt)
        okc = ok & ~is_shadow[:, None]
        t_cut, tri, u, v = _leaf_closest(tt, uu, vv, okc, tid,
                                         t_cut, tri, u, v)
        blocked = jnp.zeros_like(entry, dtype=bool)
        scale, blocked = _leaf_shadow(scene, with_leaf, d, tt, uu, vv,
                                      ok & is_shadow[:, None], tid, raw,
                                      row, scale, blocked)

        direct = new_direct
        top = jnp.where(blocked, 0, top)
        direct = jnp.where(blocked, -1, direct)
        lostc = jnp.where(blocked, 0, lostc)  # occlusion is final
        # restart lost lanes from the root: closest keeps its tightened
        # t_cut; shadow resets scale to 1 (re-accumulates — idempotent)
        drained = (direct < 0) & (top <= 0)
        restarts = lostc >> 1
        redo = drained & ((lostc & 1) == 1) & (restarts < MAX_RESTARTS)
        direct = jnp.where(redo, 0, direct)
        scale = jnp.where((redo & is_shadow)[:, None], 1.0, scale)
        lostc = jnp.where(redo, (restarts + 1) << 1, lostc)
        flag = jnp.where((direct >= 0) | (top > 0), 1, -1).astype(jnp.int32)
        return TravState(flag, direct, stack, top, lostc, t_cut, tri, u, v,
                         scale)
    return step


def trace_fused8(scene, o, d, t_lim, is_shadow, skip_tri=None, active=None):
    """Mixed-mode traversal: closest-hit lanes and any-hit shadow lanes in
    ONE wavefront loop (ROADMAP perf item 1).

    Integrators that defer NEE resolution by one bounce have both the next
    closest ray and the previous bounce's shadow ray in hand at once; tracing
    them as a single 2N wavefront averages the tail lengths of the two
    populations (straggler compaction then keeps the active fraction high)
    and halves the number of while-loop cascades per bounce.

    Per lane, `is_shadow` selects semantics:
      False — closest-hit: t_lim is the initial t_best; returns Hit fields.
      True  — any-hit with MAT_LEAF transmission (BVHShadowRay,
              integratorUtilities.cuh:188-288): t_lim is max_t; returns
              `scale` (1 clear / 0 occluded / transmission product).

    Returns (Hit, scale) — Hit rows meaningful on closest lanes, scale rows
    on shadow lanes.
    """
    n = o.shape[0]
    t_lim = jnp.broadcast_to(jnp.asarray(t_lim, jnp.float32), (n,))
    if skip_tri is None:
        skip_tri = jnp.full((n,), -1, jnp.int32)
    inv_d = safe_inv_dir(d)
    fstep = make_fused_step(scene)

    act = jnp.ones((n,), bool) if active is None else active
    ts0 = trav_start(trav_idle(n), act, t_lim)

    def step(flag, direct, stack, top, lostc, t_cut, tri, u, v, scale,
             o, d, inv_d, skip_tri, is_shadow):
        ts = TravState(flag, direct, stack, top, lostc, t_cut, tri, u, v,
                       scale)
        ts = fstep(ts, o, d, inv_d, skip_tri, is_shadow)
        return (*ts, o, d, inv_d, skip_tri, is_shadow)

    init = (*ts0, o, d, inv_d, skip_tri, is_shadow)
    out = _compacted_while(step, init, n)
    return Hit(t=out[5], tri=out[6], u=out[7], v=out[8]), out[9]
