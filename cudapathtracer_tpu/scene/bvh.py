"""SAH BVH: host-side build + TPU-friendly stackless threaded layout.

Build semantics mirror the reference's recursive CPU builder
(main.cu:17-233): longest-axis split, 12-bucket binned SAH with cost
1 + (SA_L*n_L + SA_R*n_R)/SA_parent, median (nth_element) fallback when no
valid bucket split, mean-centroid backup split, force-leaf fallback, and
epsilon-padded per-triangle AABBs (main.cu:20-47).

The *layout* is the TPU-first departure: instead of a per-thread traversal
stack (integratorUtilities.cuh:84-186 uses a 128-entry local stack), nodes
carry precomputed hit/miss links ("threaded" BVH) for each of the 8 ray
direction octants, so traversal is a single vectorized loop over the whole
ray wavefront with one int32 of state per lane. Near-child-first ordering is
recovered because each octant's thread visits the child on the ray's side of
the split axis first.

A C++ builder (csrc/bvh_builder.cpp) accelerates large scenes; the numpy
implementation below is the reference oracle and fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cudapathtracer_tpu.scene.native import native_build_bvh

AABB_PAD = 1e-6  # main.cu:33-45


@dataclass
class BVH:
    """Flat BVH with per-octant threaded links (host numpy; Scene uploads).

    bounds:    [M, 6] f32 — (minx, miny, minz, maxx, maxy, maxz)
    leaf:      [M, 2] i32 — (first, count); count == 0 for inner nodes
    links:     [M, 8, 2] i32 — per-octant (hit_link, miss_link); -1 = done
    perm:      [T] i32 — triangle permutation; leaf `first/count` index the
               permuted order (reference: BVHindices indirection; we permute
               the triangle arrays instead so leaf reads are contiguous)
    left/right/axis: [M] i32 — tree structure (kept for stats/tests)
    """
    bounds: np.ndarray
    leaf: np.ndarray
    links: np.ndarray
    perm: np.ndarray
    left: np.ndarray
    right: np.ndarray
    axis: np.ndarray

    @property
    def num_nodes(self) -> int:
        return self.bounds.shape[0]

    @property
    def max_leaf_count(self) -> int:
        return int(self.leaf[:, 1].max()) if self.num_nodes else 0


def triangle_bounds(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray):
    """Per-triangle centroid + padded AABB (computeInfoForBVH, main.cu:20-47)."""
    centroid = (p0 + p1 + p2) / 3.0
    amin = np.minimum(np.minimum(p0, p1), p2) - AABB_PAD
    amax = np.maximum(np.maximum(p0, p1), p2) + AABB_PAD
    return centroid.astype(np.float32), amin.astype(np.float32), amax.astype(np.float32)


def _surface_area(mn, mx):
    d = np.maximum(mx - mn, 0.0)
    return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def _sah_split_pos(idx, centroids, amins, amaxs, axis, min_b, max_b):
    """12-bucket binned SAH over the node bounds (SAH(), main.cu:64-131).
    Returns splitPos (float) — or the median fallback position."""
    nb = 12
    extent = max_b[axis] - min_b[axis]
    if extent <= 0.0:
        extent = 1e-30
    c = centroids[idx, axis]
    b = np.clip((nb * (c - min_b[axis]) / extent).astype(np.int64), 0, nb - 1)

    counts = np.bincount(b, minlength=nb)
    bmin = np.full((nb, 3), np.finfo(np.float32).max, np.float32)
    bmax = np.full((nb, 3), -np.finfo(np.float32).max, np.float32)
    for k in range(3):
        np.minimum.at(bmin[:, k], b, amins[idx, k])
        np.maximum.at(bmax[:, k], b, amaxs[idx, k])

    # prefix/suffix scans for left/right bounds of each candidate split
    lmin = np.minimum.accumulate(bmin, axis=0)
    lmax = np.maximum.accumulate(bmax, axis=0)
    lcount = np.cumsum(counts)
    rmin = np.minimum.accumulate(bmin[::-1], axis=0)[::-1]
    rmax = np.maximum.accumulate(bmax[::-1], axis=0)[::-1]
    rcount = np.cumsum(counts[::-1])[::-1]

    sa_parent = _surface_area(min_b, max_b)
    best_cost, best_split = np.inf, -1
    for i in range(1, nb):
        nl, nr = lcount[i - 1], rcount[i]
        if nl == 0 or nr == 0:
            continue
        cost = 1.0 + (nl * _surface_area(lmin[i - 1], lmax[i - 1])
                      + nr * _surface_area(rmin[i], rmax[i])) / max(sa_parent, 1e-30)
        if cost < best_cost:
            best_cost, best_split = cost, i

    if best_split == -1:
        # median fallback (main.cu:118-125); ties broken by original triangle
        # index so the native C++ builder agrees bit-for-bit
        order = np.lexsort((idx, c))
        mid = len(idx) // 2
        return float(c[order[mid]])
    return float(min_b[axis] + extent * (best_split / nb))


def build_bvh(centroids: np.ndarray, amins: np.ndarray, amaxs: np.ndarray,
              max_leaf_size: int = 2, use_native: bool = True,
              thread: bool = True) -> BVH:
    """Top-down SAH build (buildBVH, main.cu:133-233), iterative.

    Node order matches the reference's recursion (pre-order, left subtree
    fully before right), so flat node indices agree with a recursive build.

    thread=False skips the per-octant threaded (hit, miss) links — a
    Python-loop cost only the binary "threaded" traversal engine consumes
    (the default BVH8 engine never reads them); `links` is then a [1,8,2]
    sentinel.
    """
    n = centroids.shape[0]
    if n == 0:
        raise ValueError("empty scene")

    def mk_links(left, right, axis, leaf):
        if thread:
            return thread_links(left, right, axis, leaf)
        return np.full((1, 8, 2), -1, np.int32)

    if use_native:
        native = native_build_bvh(centroids, amins, amaxs, max_leaf_size)
        if native is not None:
            left, right, axis, leaf, bounds, perm = native
            links = mk_links(left, right, axis, leaf)
            return BVH(bounds=bounds, leaf=leaf, links=links, perm=perm,
                       left=left, right=right, axis=axis)

    perm = np.arange(n, dtype=np.int32)
    bounds_l, leaf_l, left_l, right_l, axis_l = [], [], [], [], []

    def new_node():
        bounds_l.append(None)
        leaf_l.append((0, 0))
        left_l.append(-1)
        right_l.append(-1)
        axis_l.append(-1)
        return len(bounds_l) - 1

    # Explicit stack replicating recursion order: each frame builds one node
    # and (if inner) pushes children; the parent's child pointers are patched
    # post-hoc. To match the reference's pre-order node numbering we process
    # depth-first, left first.
    def build(start: int, end: int) -> int:
        ni = new_node()
        idx = perm[start:end]
        min_b = amins[idx].min(axis=0)
        max_b = amaxs[idx].max(axis=0)
        bounds_l[ni] = np.concatenate([min_b, max_b])

        count = end - start
        if count <= max_leaf_size:
            leaf_l[ni] = (start, count)
            return ni

        ext = max_b - min_b
        axis = int(np.argmax(ext))
        split = _sah_split_pos(idx, centroids, amins, amaxs, axis, min_b, max_b)

        c = centroids[idx, axis]
        num_left = int((c < split).sum())
        if not (0 < num_left < count - 1):  # reference: numLeft>0 && numLeft<(count-1)
            # mean-centroid backup split (main.cu:196-206)
            split = float(c.mean())
            num_left = int((c < split).sum())
            if not (0 < num_left < count - 1):
                # The reference force-leafs here (main.cu:215-222), which can
                # produce leaves larger than maxLeafSize. Our traversal inlines
                # leaf triangles in fixed-width packed node rows, so we
                # hard-split by index instead (identical-centroid clusters).
                mid = start + count // 2
                axis_l[ni] = axis
                l = build(start, mid)
                r = build(mid, end)
                left_l[ni], right_l[ni] = l, r
                return ni

        sel = c < split
        # stable partition (reference uses an order-mangling swap partition;
        # stable keeps determinism and identical leaf membership)
        perm[start:end] = np.concatenate([idx[sel], idx[~sel]])
        mid = start + int(sel.sum())

        axis_l[ni] = axis
        l = build(start, mid)
        r = build(mid, end)
        left_l[ni], right_l[ni] = l, r
        return ni

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000 + 2 * n))
    try:
        build(0, n)
    finally:
        sys.setrecursionlimit(old_limit)

    bounds = np.stack(bounds_l).astype(np.float32)
    leaf = np.asarray(leaf_l, np.int32)
    left = np.asarray(left_l, np.int32)
    right = np.asarray(right_l, np.int32)
    axis = np.asarray(axis_l, np.int32)
    links = mk_links(left, right, axis, leaf)
    return BVH(bounds=bounds, leaf=leaf, links=links, perm=perm,
               left=left, right=right, axis=axis)


def thread_links(left: np.ndarray, right: np.ndarray, axis: np.ndarray,
                 leaf: np.ndarray) -> np.ndarray:
    """Compute per-octant threaded (hit, miss) links.

    Octant o encodes ray direction signs: bit k set <=> dir[k] < 0. At a node
    split on axis a, the left child (smaller coordinates) is visited first
    when dir[a] >= 0, i.e. when bit a of o is clear.

    Returns links [M, 8, 2] i32 where links[n, o] = (hit, miss):
      hit  — next node if the AABB test passes (first child for inner nodes;
             for leaves, equal to miss: triangles are tested, then continue)
      miss — next node if the AABB test fails / after finishing this subtree.
    -1 terminates traversal.
    """
    m = left.shape[0]
    links = np.full((m, 8, 2), -1, np.int32)
    is_leaf = leaf[:, 1] > 0

    for o in range(8):
        neg = [(o >> k) & 1 for k in range(3)]
        # iterative DFS carrying the "next after subtree" continuation
        stack = [(0, -1)]
        while stack:
            node, cont = stack.pop()
            links[node, o, 1] = cont
            if is_leaf[node]:
                links[node, o, 0] = cont
                continue
            l, r = left[node], right[node]
            a = axis[node]
            first, second = (l, r) if not neg[a] else (r, l)
            links[node, o, 0] = first
            stack.append((first, second))
            stack.append((second, cont))
    return links


def bvh_stats(bvh: BVH) -> dict:
    """Node/leaf counts, depth stats, top leaf sizes — parity with
    printBVHSummary (objects.cuh:84-149)."""
    m = bvh.num_nodes
    depth = np.zeros(m, np.int32)
    stack = [(0, 0)]
    leaf_depths, leaf_sizes = [], []
    while stack:
        node, d = stack.pop()
        depth[node] = d
        if bvh.leaf[node, 1] > 0:
            leaf_depths.append(d)
            leaf_sizes.append(int(bvh.leaf[node, 1]))
        else:
            stack.append((bvh.left[node], d + 1))
            stack.append((bvh.right[node], d + 1))
    leaf_depths = np.asarray(leaf_depths)
    leaf_sizes = np.asarray(leaf_sizes)
    return dict(
        num_nodes=m,
        num_leaves=int(len(leaf_sizes)),
        depth_mean=float(leaf_depths.mean()),
        depth_median=float(np.median(leaf_depths)),
        depth_std=float(leaf_depths.std()),
        depth_max=int(leaf_depths.max()),
        top_leaf_sizes=sorted(leaf_sizes.tolist(), reverse=True)[:10],
        prims_in_leaves=int(leaf_sizes.sum()),
    )
