import numpy as np
import pytest

from cudapathtracer_tpu.scene import bvh as bvh_mod
from cudapathtracer_tpu.scene.builtin import bunny_stand_in, cornell_with_blocks
from cudapathtracer_tpu.scene.native import native_available

pytestmark = pytest.mark.smoke


def make_tris(n=500, seed=0):
    rs = np.random.RandomState(seed)
    p0 = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    p1 = p0 + rs.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
    p2 = p0 + rs.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
    return p0, p1, p2


def build(n=500, seed=0, leaf=2, native=False):
    p0, p1, p2 = make_tris(n, seed)
    c, mn, mx = bvh_mod.triangle_bounds(p0, p1, p2)
    return bvh_mod.build_bvh(c, mn, mx, leaf, use_native=native), (c, mn, mx)


def test_all_prims_covered_once():
    bvh, _ = build()
    covered = np.zeros(500, bool)
    for i in range(bvh.num_nodes):
        first, count = bvh.leaf[i]
        if count > 0:
            seg = bvh.perm[first:first + count]
            assert not covered[seg].any(), "triangle in two leaves"
            covered[seg] = True
    assert covered.all(), "triangle missing from leaves"


def test_parent_aabbs_contain_children():
    bvh, (c, mn, mx) = build()
    for i in range(bvh.num_nodes):
        if bvh.leaf[i, 1] > 0:
            seg = bvh.perm[bvh.leaf[i, 0]:bvh.leaf[i, 0] + bvh.leaf[i, 1]]
            assert (bvh.bounds[i, 0:3] <= mn[seg].min(0) + 1e-6).all()
            assert (bvh.bounds[i, 3:6] >= mx[seg].max(0) - 1e-6).all()
        else:
            for ch in (bvh.left[i], bvh.right[i]):
                assert (bvh.bounds[i, 0:3] <= bvh.bounds[ch, 0:3] + 1e-6).all()
                assert (bvh.bounds[i, 3:6] >= bvh.bounds[ch, 3:6] - 1e-6).all()


def test_threaded_links_visit_every_node():
    """Following hit links everywhere must enumerate the whole tree exactly
    once per octant (DFS order)."""
    bvh, _ = build(200, 1)
    for o in range(8):
        seen = []
        cur = 0
        while cur != -1:
            seen.append(cur)
            is_leaf = bvh.leaf[cur, 1] > 0
            cur = int(bvh.links[cur, o, 1] if is_leaf else bvh.links[cur, o, 0])
        assert sorted(seen) == list(range(bvh.num_nodes))


def test_miss_links_skip_subtrees():
    bvh, _ = build(200, 2)
    # miss link of a node must not be inside its own subtree
    def subtree(n):
        out, stack = set(), [n]
        while stack:
            x = stack.pop()
            out.add(x)
            if bvh.leaf[x, 1] == 0:
                stack += [bvh.left[x], bvh.right[x]]
        return out

    for o in range(8):
        for n in range(bvh.num_nodes):
            miss = bvh.links[n, o, 1]
            if miss != -1:
                assert miss not in subtree(n)


@pytest.mark.skipif(not native_available(), reason="native builder unavailable")
def test_native_matches_numpy():
    for seed in (0, 3):
        bvh_py, (c, mn, mx) = build(400, seed, leaf=3, native=False)
        bvh_cc = bvh_mod.build_bvh(c, mn, mx, 3, use_native=True)
        np.testing.assert_array_equal(bvh_py.perm, bvh_cc.perm)
        np.testing.assert_array_equal(bvh_py.leaf, bvh_cc.leaf)
        np.testing.assert_array_equal(bvh_py.left, bvh_cc.left)
        np.testing.assert_array_equal(bvh_py.right, bvh_cc.right)
        np.testing.assert_allclose(bvh_py.bounds, bvh_cc.bounds, rtol=1e-6)
        np.testing.assert_array_equal(bvh_py.links, bvh_cc.links)


def test_leaf_size_respected_mostly():
    bvh, _ = build(1000, 4, leaf=4)
    # force-leaf fallback can exceed maxLeafSize, but the bulk must respect it
    sizes = bvh.leaf[bvh.leaf[:, 1] > 0, 1]
    assert np.median(sizes) <= 4


def test_stats_shape():
    mesh = cornell_with_blocks()
    from cudapathtracer_tpu.scene.scene import build_scene
    from cudapathtracer_tpu.scene.materials import builtin_materials
    scene, bvh = build_scene(mesh, builtin_materials(), use_sbvh=False)
    stats = bvh_mod.bvh_stats(bvh)
    assert stats["prims_in_leaves"] == mesh.num_triangles
    assert stats["num_nodes"] == bvh.num_nodes
    # SBVH (default) may duplicate references: prims_in_leaves counts
    # REFERENCES and can only grow
    _, bvh_s = build_scene(mesh, builtin_materials(), use_sbvh=True)
    stats_s = bvh_mod.bvh_stats(bvh_s)
    assert stats_s["prims_in_leaves"] >= mesh.num_triangles


@pytest.mark.skipif(not native_available(), reason="no native lib")
@pytest.mark.parametrize("policy", ["greedy", "sah"])
def test_native_bvh8_collapse_matches_python_oracle(policy):
    """csrc/bvh8_collapse.cpp must emit a bit-identical table to the
    numpy collapse oracles (scene/bvh8.collapse_py / collapse_sah_py)
    including leaf-material id flags, empty-slot sentinels and row order."""
    from cudapathtracer_tpu.scene import bvh8

    oracle = (bvh8.collapse_sah_py if policy == "sah" else bvh8.collapse_py)
    for n, seed, leaf_tris in [(500, 0, 4), (2000, 1, 4), (777, 2, 2)]:
        bvh, _ = build(n, seed, leaf=2, native=False)
        p0, p1, p2 = make_tris(n, seed)
        p0, p1, p2 = p0[bvh.perm], p1[bvh.perm], p2[bvh.perm]
        tp = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
        lm = np.zeros(n, bool)
        lm[::5] = True
        a = oracle(bvh, tp, lm, leaf_tris=leaf_tris)
        b = bvh8.collapse(bvh, tp, lm, leaf_tris=leaf_tris, policy=policy)
        assert b.table.shape == a.table.shape
        assert np.array_equal(a.table.view(np.int32), b.table.view(np.int32))
        assert (a.num_nodes, a.num_leaves) == (b.num_nodes, b.num_leaves)


def test_sah_collapse_covers_all_triangles_and_costs_less():
    """The SAH collapse must (a) place every triangle in exactly one leaf
    row, and (b) never exceed the greedy policy's expected-visited-rows
    cost (sum of emitted-row subtree areas — it is the DP optimum)."""
    from cudapathtracer_tpu.scene import bvh8

    for n, seed in [(500, 0), (3000, 3)]:
        bvh, _ = build(n, seed, leaf=2, native=False)
        p0, p1, p2 = make_tris(n, seed)
        p0, p1, p2 = p0[bvh.perm], p1[bvh.perm], p2[bvh.perm]
        tp = np.concatenate([p0, p1 - p0, p2 - p0],
                            axis=1).astype(np.float32)
        lm = np.zeros(n, bool)

        def walk(b8):
            """Walk the hybrid CBVH table from the root; returns (tri ids
            found in inline slots, expected-visited-rows SAH cost = sum of
            row areas) — the DP objective, recomputed from the table.
            Hybrid layout: every row carries inline tris at TRI_OFF and
            children via finite bound slots (scene/bvh8.py)."""
            tids, cost = [], 0.0
            stack = [0]
            TO = bvh8.TRI_OFF
            while stack:
                r = stack.pop()
                row = b8.table[r]
                ids = row[TO + 9 * 4:TO + 10 * 4].view(np.int32)
                tids.extend(int(t) for t in ids if t >= 0)
                base = int(row[48:49].view(np.int32)[0])
                box = row[0:48].reshape(6, 8)
                for i in range(8):
                    if not np.isfinite(box[0, i]):
                        continue  # empty/absorbed slot
                    ext = np.maximum(box[3:6, i] - box[0:3, i], 0.0)
                    cost += 2.0 * (ext[0] * ext[1] + ext[1] * ext[2]
                                   + ext[2] * ext[0])
                    stack.append(base + i)
            return tids, cost

        costs = {}
        for policy, fn in [("greedy", bvh8.collapse_py),
                           ("sah", bvh8.collapse_sah_py)]:
            b8 = fn(bvh, tp, lm, leaf_tris=4)
            tids, cost = walk(b8)
            assert np.array_equal(np.sort(tids), np.arange(n)), policy
            costs[policy] = cost
        # DP optimality: the SAH partition can only lower the expected
        # visited-rows cost (root row is common to both; small float slack)
        assert costs["sah"] <= costs["greedy"] * (1 + 1e-5)


def test_sbvh_covers_all_tris_and_bounds_contain_refs():
    """SBVH (bvh.build_sbvh): references may duplicate triangles, but
    every triangle appears at least once, every leaf range is in-bounds,
    parent AABBs contain children, and the reference budget holds."""
    from cudapathtracer_tpu.scene.builtin import cornell_with_blocks
    mesh = cornell_with_blocks()
    pos = mesh.positions
    p0 = pos[mesh.pos_idx[:, 0]]
    p1 = pos[mesh.pos_idx[:, 1]]
    p2 = pos[mesh.pos_idx[:, 2]]
    b = bvh_mod.build_sbvh(p0, p1, p2, 2)
    n = p0.shape[0]
    assert n <= b.perm.size <= int(1.5 * n)
    assert np.array_equal(np.unique(b.perm), np.arange(n))
    is_leaf = b.leaf[:, 1] > 0
    # leaf ranges tile [0, R) exactly once, in pre-order
    order = np.argsort(b.leaf[is_leaf, 0])
    firsts = b.leaf[is_leaf, 0][order]
    counts = b.leaf[is_leaf, 1][order]
    assert firsts[0] == 0
    assert np.array_equal(firsts[1:], (firsts + counts)[:-1])
    assert firsts[-1] + counts[-1] == b.perm.size
    for i in range(b.num_nodes):
        if not is_leaf[i]:
            for ch in (b.left[i], b.right[i]):
                assert np.all(b.bounds[ch, 0:3] >= b.bounds[i, 0:3] - 1e-5)
                assert np.all(b.bounds[ch, 3:6] <= b.bounds[i, 3:6] + 1e-5)
