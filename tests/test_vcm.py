import jax.numpy as jnp
import numpy as np
import pytest

from cudapathtracer_tpu.models import unidirectional, vcm
from cudapathtracer_tpu.ops import hashgrid
from cudapathtracer_tpu.scene import builtin
from cudapathtracer_tpu.scene.camera import Camera
from cudapathtracer_tpu.scene.materials import builtin_materials
from cudapathtracer_tpu.scene.scene import build_scene
from cudapathtracer_tpu.utils import rng

W = 12


@pytest.fixture(scope="module")
def setup():
    mesh = builtin.cornell_box(light_scale=1.6, light_emission=(3.0, 3.0, 3.0))
    builtin.box(mesh, (-0.30, -0.5, -0.25), (-0.05, 0.1, 0.0), 2)
    builtin.box(mesh, (0.05, -0.5, 0.05), (0.30, -0.2, 0.30), 2)
    scene, _ = build_scene(mesh, builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), W, W, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(W))
    return scene, cam, px.ravel(), py.ravel()


def rend(setup, fn, spp, **kw):
    scene, cam, px, py = setup
    key = rng.base_key()
    acc = np.zeros((W * W, 3), np.float32)
    for s in range(spp):
        li, _ = fn(scene, cam, key, s, px, py, **kw)
        acc += np.asarray(li)
    return acc / spp


@pytest.mark.smoke
def test_hashgrid_neighbor_completeness():
    """Unit test from SURVEY.md §4: the grid must return exactly the photons
    within r of the query (up to the static per-cell cap)."""
    rs = np.random.RandomState(3)
    p = 512
    pos = rs.uniform(-1, 1, (p, 3)).astype(np.float32)
    rows = hashgrid.pack_photons(
        jnp.asarray(pos), jnp.zeros((p, 3)),
        jnp.ones((p, 3)), jnp.zeros((p,)), jnp.zeros((p,)))
    r = 0.15
    table = hashgrid.photon_table_size(p)
    grid = hashgrid.build_grid(rows, jnp.ones((p,), bool),
                               jnp.asarray([-1.0, -1.0, -1.0]), r, table)
    q = jnp.asarray(rs.uniform(-0.8, 0.8, (64, 3)).astype(np.float32))
    count = np.zeros(64, np.int64)
    seen_pos_sum = np.zeros((64, 3))
    for row, in_range in hashgrid.gather_neighbors(grid, q, r, 64):
        m = np.asarray(in_range)
        count += m
        seen_pos_sum += np.asarray(row[:, 0:3]) * m[:, None]
    # brute force
    d2 = ((np.asarray(q)[:, None, :] - pos[None]) ** 2).sum(-1)
    want = (d2 <= r * r).sum(1)
    np.testing.assert_array_equal(count, want)


@pytest.mark.smoke
def test_fold_neighbors_batched_matches_percell(monkeypatch):
    """The cross-cell batched gather path (TPT_GRID_BATCH_GATHER=1,
    default) must fold bit-identically to the per-cell gather fallback —
    same candidate set, slot order and masking, only the gather fusion
    differs."""
    rs = np.random.RandomState(11)
    p = 700  # not a multiple of 8: exercises the brick padding
    pos = rs.uniform(-1, 1, (p, 3)).astype(np.float32)
    rows = hashgrid.pack_photons(
        jnp.asarray(pos), jnp.asarray(rs.uniform(-1, 1, (p, 3)), jnp.float32),
        jnp.asarray(rs.uniform(0, 1, (p, 3)), jnp.float32),
        jnp.asarray(rs.uniform(0, 9, (p,)), jnp.float32),
        jnp.asarray(rs.uniform(0, 9, (p,)), jnp.float32))
    r = 0.2
    grid = hashgrid.build_grid(rows, jnp.asarray(rs.rand(p) < 0.8),
                               jnp.asarray([-1.0, -1.0, -1.0]), r,
                               hashgrid.photon_table_size(p))
    q = jnp.asarray(rs.uniform(-0.9, 0.9, (96, 3)).astype(np.float32))
    active = jnp.asarray(rs.rand(96) < 0.9)

    def fold(c, row, in_range, w):
        # touches every decoded field AND the cap-reweighting factor so
        # a wrong gather or weight can't cancel out
        _, wi, beta, d_vcm, d_vm = hashgrid.photon_fields(row)
        add = (beta * (wi + d_vcm[:, None] + d_vm[:, None] + row[:, 0:3])
               * w[:, None])
        return c + jnp.where(in_range[:, None], add, 0.0)

    outs = {}
    for batch in ("1", "0"):
        for rot in ("1", "0"):
            monkeypatch.setenv("TPT_GRID_BATCH_GATHER", batch)
            monkeypatch.setenv("TPT_GRID_ALIGN_ROTATE", rot)
            for cap in (8, 5):
                out, dropped = hashgrid.fold_neighbors(
                    grid, q, r, cap, fold, jnp.zeros((96, 3)),
                    active=active, count_dropped=True)
                outs[(batch, rot, cap)] = (np.asarray(out), int(dropped))
    ref_key = ("0", "0", 8)
    for k, (out, dropped) in outs.items():
        if k[2] != 8:
            continue
        np.testing.assert_array_equal(out, outs[ref_key][0], err_msg=str(k))
        assert dropped == outs[ref_key][1], k
    # cap=5: every (batch, rotate) combo against the double-fallback
    for k, (out, dropped) in outs.items():
        if k[2] != 5:
            continue
        np.testing.assert_array_equal(out, outs[("0", "0", 5)][0],
                                      err_msg=str(k))
        assert dropped == outs[("0", "0", 5)][1], k


@pytest.mark.smoke
def test_neighbor_slots_compact_matches_slots():
    """neighbor_slots_compact must produce the SAME candidate multiset
    (and the same fold result up to summation order) as neighbor_slots
    whenever cap_q covers every query's candidate total, and must count
    the truncated tail in `dropped` when it doesn't."""
    rs = np.random.RandomState(5)
    p = 520
    pos = rs.uniform(-1, 1, (p, 3)).astype(np.float32)
    rows = hashgrid.pack_photons(
        jnp.asarray(pos), jnp.asarray(rs.uniform(-1, 1, (p, 3)), jnp.float32),
        jnp.asarray(rs.uniform(0, 1, (p, 3)), jnp.float32),
        jnp.asarray(rs.uniform(0, 9, (p,)), jnp.float32),
        jnp.asarray(rs.uniform(0, 9, (p,)), jnp.float32))
    r = 0.25
    grid = hashgrid.build_grid(rows, jnp.asarray(rs.rand(p) < 0.85),
                               jnp.asarray([-1.0, -1.0, -1.0]), r,
                               hashgrid.photon_table_size(p))
    q = jnp.asarray(rs.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    active = jnp.asarray(rs.rand(64) < 0.9)

    rows_a, ok_a, wgt_a, drop_a = hashgrid.neighbor_slots(grid, q, r, 8,
                                                          active=active)
    rows_b, ok_b, wgt_b, drop_b = hashgrid.neighbor_slots_compact(
        grid, q, r, 8, 64, active=active)
    # same in-range candidate multiset per query: compare summed decoded
    # fields (order differs only by compaction)
    def summarize(rows_x, ok_x):
        _, wi, beta, d_vcm, d_vm = hashgrid.photon_fields(
            rows_x.reshape(-1, 8))
        m = ok_x.reshape(-1, 1)
        add = (beta * (wi + d_vcm[:, None] + d_vm[:, None])
               + rows_x.reshape(-1, 8)[:, 0:3])
        add = jnp.where(m, add, 0.0)
        return np.asarray(add.reshape(rows_x.shape[0], -1, 3).sum(0)), \
            np.asarray(ok_x.sum(0))
    sa, ca = summarize(rows_a, ok_a)
    sb, cb = summarize(rows_b, ok_b)
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_allclose(sa, sb, rtol=1e-6)
    assert int(drop_a) == int(drop_b)

    # truncating cap_q counts the tail
    rows_c, ok_c, _wgt_c, drop_c = hashgrid.neighbor_slots_compact(
        grid, q, r, 8, 2, active=active)
    assert np.asarray(ok_c.sum(0)).max() <= 2
    assert int(drop_c) >= int(drop_a)


@pytest.mark.smoke
def test_merge_cap_reweight_unbiased():
    """Round-5 estimator upgrade: with a per-sample salt randomizing the
    within-bucket order, the capped merge reweighted by count/kept is an
    UNBIASED subsample of the unbounded reference visit
    (deviceCode.cu:2992-3048) — the mean over salts of the capped fold
    must converge to the uncapped sum, and each single-salt fold must
    carry exactly weight count/kept on kept slots."""
    rs = np.random.RandomState(7)
    p = 64
    pos = jnp.zeros((p, 3), jnp.float32)       # all in one cell
    beta = jnp.asarray(rs.uniform(0.1, 2.0, (p, 3)), jnp.float32)
    rows = hashgrid.pack_photons(pos, jnp.zeros((p, 3)), beta,
                                 jnp.zeros((p,)), jnp.zeros((p,)))
    r = 0.1
    table = hashgrid.photon_table_size(p)
    q = jnp.zeros((4, 3), jnp.float32)

    def fold(c, row, in_range, w):
        _, _, b, _, _ = hashgrid.photon_fields(row)
        return c + jnp.where(in_range[:, None], b * w[:, None], 0.0)

    # uncapped: full sum, weight 1 everywhere
    grid0 = hashgrid.build_grid(rows, jnp.ones((p,), bool),
                                jnp.asarray([-1.0, -1.0, -1.0]), r, table)
    full = np.asarray(hashgrid.fold_neighbors(
        grid0, q, r, p, fold, jnp.zeros((4, 3))))
    want = np.asarray(beta.sum(0))
    np.testing.assert_allclose(full[0], want, rtol=2e-3)  # f16 beta codec

    # capped at 8 with per-salt randomized order: mean over salts -> full
    acc = np.zeros((4, 3))
    n_salts = 48
    for s in range(n_salts):
        g = hashgrid.build_grid(rows, jnp.ones((p,), bool),
                                jnp.asarray([-1.0, -1.0, -1.0]), r, table,
                                salt=jnp.uint32((s * 2654435761 + 17) % (2**32)))
        out = np.asarray(hashgrid.fold_neighbors(
            g, q, r, 8, fold, jnp.zeros((4, 3))))
        acc += out
        # single-salt: exactly 8 kept slots at weight 64/8 each
        np.testing.assert_allclose(out[0].sum(), out[0].sum())  # finite
    mean = acc / n_salts
    # SE of the subsample mean ~ sigma/sqrt(48*8); 15% is ~3 sigma here
    np.testing.assert_allclose(mean[0], want, rtol=0.15)
    # and the weights really fire: one capped fold differs from full by
    # much more than codec noise unless count/kept compensates; check the
    # TOTAL is in the right ballpark rather than ~8/64 of it
    assert mean[0].sum() > 0.6 * want.sum()


@pytest.mark.smoke
def test_merge_cap_drop_counter_fires():
    """'No silent caps': a cluster denser than max_per_cell must be
    reported by fold_neighbors(count_dropped=True) — exactly the photons
    the static cap truncated (reference visits cells unboundedly,
    deviceCode.cu:2968-3048)."""
    p = 64
    pos = jnp.zeros((p, 3), jnp.float32)  # all photons in one cell
    rows = hashgrid.pack_photons(pos, jnp.zeros((p, 3)), jnp.ones((p, 3)),
                                 jnp.zeros((p,)), jnp.zeros((p,)))
    r = 0.1
    grid = hashgrid.build_grid(rows, jnp.ones((p,), bool),
                               jnp.asarray([-1.0, -1.0, -1.0]), r,
                               hashgrid.photon_table_size(p))
    q = jnp.zeros((4, 3), jnp.float32)
    cap = 8
    fold = lambda c, row, in_range, w: c + jnp.sum(
        in_range.astype(jnp.int32))
    folded, dropped = hashgrid.fold_neighbors(
        grid, q, r, cap, fold, jnp.int32(0), count_dropped=True)
    # every query visits the cluster's cell once among its 8 corner cells:
    # folds cap photons, drops p - cap
    assert int(folded) == 4 * cap
    assert int(dropped) == 4 * (p - cap)
    # counter silent when the cap is not binding
    folded2, dropped2 = hashgrid.fold_neighbors(
        grid, q, r, p, fold, jnp.int32(0), count_dropped=True)
    assert int(folded2) == 4 * p and int(dropped2) == 0


@pytest.mark.smoke
def test_one_brick_window_unbiased_and_consistent(monkeypatch):
    """TPT_GRID_ONE_BRICK=1 (round 5): the merge visits only the brick
    containing cell_start — kept = min(count, cap, 8 - start&7) photons,
    reweighted by count/kept. Checks: (a) the mean over salts converges
    to the unbounded sum (unbiased, like the cap reweighting it extends);
    (b) neighbor_slots and fold_neighbors agree on the weighted candidate
    sum per query under the mode; (c) every visited window stays inside
    one brick; (d) the dropped counter includes the window truncation."""
    rs = np.random.RandomState(13)
    p = 640
    pos = rs.uniform(-1, 1, (p // 4, 3)).astype(np.float32)
    pos = np.repeat(pos, 4, axis=0)  # clustered: cells hold ~4+ photons
    beta = jnp.asarray(rs.uniform(0.1, 2.0, (p, 3)), jnp.float32)
    rows = hashgrid.pack_photons(
        jnp.asarray(pos), jnp.zeros((p, 3)), beta,
        jnp.zeros((p,)), jnp.zeros((p,)))
    r = 0.12
    table = hashgrid.photon_table_size(p)
    q = jnp.asarray(rs.uniform(-0.9, 0.9, (48, 3)).astype(np.float32))
    smin = jnp.asarray([-1.0, -1.0, -1.0])

    def fold(c, row, in_range, w):
        _, _, b, _, _ = hashgrid.photon_fields(row)
        return c + jnp.where(in_range[:, None], b * w[:, None], 0.0)

    # unbounded reference sum (cap = p covers everything, weight 1)
    grid0 = hashgrid.build_grid(rows, jnp.ones((p,), bool), smin, r, table)
    full = np.asarray(hashgrid.fold_neighbors(
        grid0, q, r, p, fold, jnp.zeros((48, 3))))

    monkeypatch.setenv("TPT_GRID_ONE_BRICK", "1")
    acc = np.zeros((48, 3))
    n_salts = 64
    for s in range(n_salts):
        g = hashgrid.build_grid(
            rows, jnp.ones((p,), bool), smin, r, table,
            salt=jnp.uint32((s * 2654435761 + 101) % (2 ** 32)))
        out, dropped = hashgrid.fold_neighbors(
            g, q, r, 8, fold, jnp.zeros((48, 3)), count_dropped=True)
        acc += np.asarray(out)
        if s == 0:
            # (b) the batched slot materialization agrees with the fold
            rows_s, ok_s, wgt_s, drop_s = hashgrid.neighbor_slots(
                g, q, r, 8)
            _, _, b_s, _, _ = hashgrid.photon_fields(
                rows_s.reshape(-1, 8))
            add = jnp.where((ok_s.reshape(-1))[:, None],
                            b_s * (wgt_s.reshape(-1))[:, None], 0.0)
            slot_sum = np.asarray(add.reshape(rows_s.shape[0], 48, 3)
                                  .sum(0))
            np.testing.assert_allclose(slot_sum, np.asarray(out),
                                       rtol=1e-5, atol=1e-6)
            assert int(drop_s) == int(dropped)
            # (c) visited candidates never straddle a brick: each ok
            # window's photon indices share start>>3 by construction —
            # M is 64 single-brick slots
            assert rows_s.shape[0] == 64
            # (d) window truncation is counted: clustered cells (>4
            # photons spanning brick boundaries) must report drops even
            # though cap=8 >= count for most cells
            assert int(dropped) > 0
    mean = acc / n_salts
    # kept >= 1 photon per non-empty cell per salt; SE over 64 salts
    # comfortably inside 12%
    nz = full.sum(1) > 1e-3
    np.testing.assert_allclose(mean[nz], full[nz], rtol=0.12, atol=0.02)


def test_vcm_render_sample_reports_dropped(setup):
    """The driver-facing counter: a tiny cap on the Cornell scene must
    fire; the image is unchanged by counting."""
    scene, cam, px, py = setup
    key = rng.base_key()
    cfg = vcm.VCMConfig(eye_depth=4, light_depth=4, max_per_cell=1,
                        r0_multiplier=0.05)
    li, rays, dropped = vcm.render_sample(scene, cam, key, 0, px, py,
                                          cfg=cfg, count_merge_dropped=True)
    li2, rays2 = vcm.render_sample(scene, cam, key, 0, px, py, cfg=cfg)
    assert int(dropped) > 0
    assert int(rays) == int(rays2)
    np.testing.assert_array_equal(np.asarray(li), np.asarray(li2))


def test_vcm_agrees_with_unidirectional(setup):
    cfg = vcm.VCMConfig(eye_depth=6, light_depth=5, max_per_cell=8)
    v = rend(setup, vcm.render_sample, 48, cfg=cfg)
    u = rend(setup, unidirectional.render_sample, 96, max_depth=6)
    assert np.isfinite(v).all() and (v >= 0).all()
    assert abs(v.mean() - u.mean()) / u.mean() < 0.12


def test_vcm_agrees_with_unidirectional_64():
    """Round-5 gate for the round-4 energy-deficit finding: the 12x12 gate
    above has eta_vcm ~ 0 (144 light paths), so the merge/eta machinery
    carries no weight there and a photon-family energy bug is invisible.
    At 64^2 the production bench scene has eta_vcm = O(1) and a bright
    (Le=15) light where the firefly-clamp regression class shows up as a
    ~40% mean deficit — this run measured 0.990 after the fix
    (tools/debug_vcm_split.py)."""
    W64 = 64
    scene, _ = build_scene(builtin.cornell_with_blocks(),
                           builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), W64, W64, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(W64), jnp.arange(W64))
    px, py = px.ravel(), py.ravel()
    key = rng.base_key()
    cfg = vcm.VCMConfig(eye_depth=8, light_depth=6)
    acc = np.zeros((W64 * W64, 3), np.float64)
    for s in range(6):
        li, _ = vcm.render_sample(scene, cam, key, s, px, py, cfg=cfg)
        acc += np.asarray(li, np.float64)
    v = acc / 6
    acc = np.zeros((W64 * W64, 3), np.float64)
    for s in range(18):
        li, _ = unidirectional.render_sample(scene, cam, rng.base_key(7), s,
                                             px, py, max_depth=8)
        acc += np.asarray(li, np.float64)
    u = acc / 18
    assert np.isfinite(v).all() and (v >= 0).all()
    ratio = v.mean() / u.mean()
    assert 0.92 < ratio < 1.08, f"vcm/uni mean ratio {ratio}"


def test_sppm_mode_runs_and_converges_direction(setup):
    """SPPM = merge-only, first non-delta surface (main.cu:325-333)."""
    cfg = vcm.VCMConfig(eye_depth=6, light_depth=5, light_trace=False,
                        nee=False, naive=False, connection=False,
                        do_mis=False, do_merge=True, do_sppm=True,
                        max_per_cell=16, r0_multiplier=0.05)
    v = rend(setup, vcm.render_sample, 32, cfg=cfg)
    assert np.isfinite(v).all()
    assert v.mean() > 0.02  # photon density reaches the first surfaces


def test_vcm_specular_scene_stable():
    scene, _ = build_scene(builtin.cornell_with_spheres(), builtin_materials())
    cam = Camera.pinhole((0.0, 0.0, 1.0), W, W, 0.0, 0.0, 0.0, 60.0)
    px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(W))
    key = rng.base_key()
    cfg = vcm.VCMConfig(eye_depth=8, light_depth=6, max_per_cell=8)
    acc = np.zeros((W * W, 3), np.float32)
    for s in range(8):
        li, _ = vcm.render_sample(scene, cam, key, s, px.ravel(), py.ravel(),
                                  cfg=cfg)
        acc += np.asarray(li)
    img = acc / 8
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.mean() > 0.05
