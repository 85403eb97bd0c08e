"""BVH8: 8-wide BVH collapsed from the binary SAH tree.

Why: threaded binary traversal costs ONE row gather per visited node, and on
TPU the gather is the dominant per-step cost (~µs-scale per wavefront) while
VPU math is nearly free. An 8-wide node tests all 8 child AABBs from a
single gathered row, pruning subtrees without visiting them — ~3-4x fewer
gathers per ray. The price is per-lane stack state, which is kept as wide
[N, D] arrays manipulated with one-hot masks (pure VPU, no narrow slices).

Unified table layout (float32, [M8 + L, 64]):

  inner node row r < num_nodes:
    [0:48]  child AABBs grouped by coordinate for wide slab tests:
            minx[8], miny[8], minz[8], maxx[8], maxy[8], maxz[8]
    [48:56] child meta (int32 bitcast): -1 empty; row index of an inner
            child; or (leaf_row | LEAF_BIT) for leaf children
    [56:64] pad

  leaf row r >= num_nodes (up to LEAF_TRIS triangles):
    [0:36]  triangles v0,e1,e2 x LEAF_TRIS(=4)
    [36:40] triangle ids (int32 bitcast; bit30 = leaf-material flag; -1 pad)
    [40:64] pad

Children keep the binary builder's in-order layout, so every collapsed
subtree's triangle range is contiguous in the permuted order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LEAF_BIT = 1 << 30
LEAF_TRIS = 4
ROW_W = 64


@dataclass
class BVH8:
    table: np.ndarray      # [R, 64] f32 (nodes then leaves)
    num_nodes: int
    num_leaves: int


def _subtree_range(bvh, node):
    """Contiguous [start, end) triangle range of a binary subtree (the
    builder emits leaves in-order)."""
    # walk to leftmost and rightmost leaves
    lo = node
    while bvh.leaf[lo, 1] == 0:
        lo = bvh.left[lo]
    hi = node
    while bvh.leaf[hi, 1] == 0:
        hi = bvh.right[hi]
    return int(bvh.leaf[lo, 0]), int(bvh.leaf[hi, 0] + bvh.leaf[hi, 1])


def _area(bounds):
    d = np.maximum(bounds[3:6] - bounds[0:3], 0.0)
    return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def collapse(bvh, tri_pack: np.ndarray, tri_is_leaf_mat: np.ndarray) -> BVH8:
    """Collapse the binary BVH into the unified BVH8 table."""
    # Pass 1: decide BVH8 nodes + leaves via BFS from the binary root.
    nodes: list[list] = []       # each: list of (binary_node, is_leaf8)
    leaf_rows: list[tuple] = []  # (start, count)
    node_of_binary: dict[int, int] = {}
    pending = [0]
    binary_of_node8: list[list] = []

    def expand(b):
        """Expand binary node b into up to 8 children (binary subtree roots
        or leaf ranges <= LEAF_TRIS)."""
        children = [b]
        while len(children) < 8:
            # pick the expandable child with the largest surface area
            best, best_a = -1, -1.0
            for i, c in enumerate(children):
                if bvh.leaf[c, 1] == 0:  # inner binary node
                    s, e = _subtree_range(bvh, c)
                    if e - s > LEAF_TRIS:
                        a = _area(bvh.bounds[c])
                        if a > best_a:
                            best, best_a = i, a
            if best == -1:
                break
            c = children.pop(best)
            children.insert(best, bvh.right[c])
            children.insert(best, bvh.left[c])
        return children

    while pending:
        b = pending.pop()
        if b in node_of_binary:
            continue
        node_of_binary[b] = len(binary_of_node8)
        children = expand(b)
        binary_of_node8.append(children)
        for c in children:
            s, e = _subtree_range(bvh, c)
            if e - s > LEAF_TRIS:
                pending.append(c)

    m8 = len(binary_of_node8)

    # Pass 2: emit rows
    rows = []
    leaf_row_of_range: dict[tuple, int] = {}
    leaf_rows_data = []

    def leaf_row(s, e):
        key = (s, e)
        if key not in leaf_row_of_range:
            leaf_row_of_range[key] = len(leaf_rows_data)
            row = np.zeros(ROW_W, np.float32)
            ids = np.full(LEAF_TRIS, -1, np.int32)
            for k in range(e - s):
                row[9 * k: 9 * k + 9] = tri_pack[s + k]
                tid = np.int32(s + k)
                if tri_is_leaf_mat[s + k]:
                    tid = np.int32(tid | LEAF_BIT)
                ids[k] = tid
            row[36:40] = ids.view(np.float32)
            leaf_rows_data.append(row)
        return leaf_row_of_range[key]

    for children in binary_of_node8:
        row = np.zeros(ROW_W, np.float32)
        meta = np.full(8, -1, np.int32)
        for i, c in enumerate(children):
            b = bvh.bounds[c]
            row[0 * 8 + i] = b[0]
            row[1 * 8 + i] = b[1]
            row[2 * 8 + i] = b[2]
            row[3 * 8 + i] = b[3]
            row[4 * 8 + i] = b[4]
            row[5 * 8 + i] = b[5]
            s, e = _subtree_range(bvh, c)
            if e - s > LEAF_TRIS:
                meta[i] = node_of_binary[c]
            else:
                meta[i] = np.int32(m8 + leaf_row(s, e)) | LEAF_BIT
        row[48:56] = meta.view(np.float32)
        rows.append(row)

    # leaf meta stored (m8 + local) at emit time; rows are nodes then leaves
    table = np.stack(rows + leaf_rows_data).astype(np.float32)
    return BVH8(table=table, num_nodes=m8, num_leaves=len(leaf_rows_data))
