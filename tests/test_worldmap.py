"""Map state tests: insertion, association bookkeeping, covisibility,
point stats (dMin/dMax/medoid descriptor), culling rules, BA window assembly
and write-back — semantics mirrored from Map/ThreadSafeMap/MapPoint."""

import numpy as np
import jax.numpy as jnp

from mageslam_tpu.ba import BAState, step_bundle_adjust
from mageslam_tpu.geometry.se3 import Pose, retract
from mageslam_tpu.worldmap import MapState, covisibility_matrix, empty_map, membership_matrix
from mageslam_tpu.worldmap.ba_window import apply_ba_results, build_local_ba_window
from mageslam_tpu.worldmap.map_state import (
    compute_dmin_dmax,
    observation_counts,
    point_octave_histogram,
    predict_octave,
    refresh_point_stats,
)
from mageslam_tpu.worldmap.operations import (
    create_map_points,
    cull_local_keyframes,
    cull_recent_map_points,
    insert_keyframe,
    merge_map_points,
    remove_keyframes,
    remove_map_points,
)

K_CAP, P_CAP, N_CAP = 16, 128, 32
CAM = jnp.array([300.0, 300.0, 160.0, 120.0])


def mk_features(rng, n_valid=N_CAP):
    xy = jnp.array(rng.uniform(0, 320, (N_CAP, 2)), jnp.float32)
    octv = jnp.array(rng.randint(0, 3, N_CAP), jnp.int32)
    desc = jnp.array(rng.randint(0, 2**31, (N_CAP, 8)), jnp.uint32)
    valid = jnp.arange(N_CAP) < n_valid
    return xy, octv, desc, valid


def insert(state, rng, pose=None, assoc=None, **kw):
    xy, octv, desc, valid = mk_features(rng)
    pose = pose or Pose.identity()
    if assoc is None:
        assoc = jnp.full((N_CAP,), -1, jnp.int32)
    return insert_keyframe(state, pose, CAM, jnp.int32(0), xy, octv, desc, valid,
                           assoc, **kw)


class TestBanks:
    def test_insert_and_create(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        m, s0 = insert(m, rng)
        m, s1 = insert(m, rng)
        assert int(s0) == 0 and int(s1) == 1
        assert bool(m.kf_valid[0]) and bool(m.kf_valid[1])
        assert int(m.kf_order[1]) == 1

        # create 5 points observed by both keyframes at features 0..4
        want = jnp.arange(8) < 5
        pos = jnp.array(np.random.RandomState(1).uniform(-1, 1, (8, 3)), jnp.float32)
        desc = jnp.zeros((8, 8), jnp.uint32)
        idx = jnp.arange(8, dtype=jnp.int32)
        m, slots = create_map_points(
            m, pos, desc, jnp.zeros(8, jnp.int32), idx, jnp.ones(8, jnp.int32), idx, want
        )
        assert int(jnp.sum(m.mp_valid)) == 5
        assert int(slots[4]) >= 0 and int(slots[5]) == -1
        member = membership_matrix(m)
        assert int(jnp.sum(member[0])) == 5 and int(jnp.sum(member[1])) == 5
        covis = covisibility_matrix(m)
        assert int(covis[0, 1]) == 5 and int(covis[0, 0]) == 0
        np.testing.assert_array_equal(observation_counts(m)[np.array(slots[:5])], 2)

    def test_remove_points_clears_assocs(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        m, _ = insert(m, rng)
        want = jnp.arange(4) < 4
        m, slots = create_map_points(
            m, jnp.zeros((4, 3)), jnp.zeros((4, 8), jnp.uint32),
            jnp.zeros(4, jnp.int32), jnp.arange(4, dtype=jnp.int32),
            jnp.zeros(4, jnp.int32), jnp.arange(4, dtype=jnp.int32), want,
        )
        kill = jnp.zeros((P_CAP,), bool).at[slots[1]].set(True)
        m = remove_map_points(m, kill)
        assert not bool(m.mp_valid[slots[1]])
        assert int(m.kf_assoc[0, 1]) == -1
        assert int(m.kf_assoc[0, 0]) == int(slots[0])

    def test_merge_points(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        m, _ = insert(m, rng)
        m, _ = insert(m, rng)
        # kf0 sees pt A (feat 0) and pt B (feat 1); kf1 sees only pt B (feat 0)
        want = jnp.arange(2) < 2
        m, slots = create_map_points(
            m,
            jnp.zeros((2, 3)), jnp.zeros((2, 8), jnp.uint32),
            jnp.array([0, 0], jnp.int32), jnp.array([0, 1], jnp.int32),
            jnp.array([1, 1], jnp.int32), jnp.array([5, 0], jnp.int32),
            want,
        )
        a, b = int(slots[0]), int(slots[1])
        # merge A into B: kf0 feat0 pointed at A → retargets to B, but kf0
        # already sees B at feat1 → duplicate dropped
        m2 = merge_map_points(m, jnp.array([a], jnp.int32), jnp.array([b], jnp.int32),
                              jnp.array([True]))
        assert not bool(m2.mp_valid[a])
        row0 = np.array(m2.kf_assoc[0])
        assert (row0 == b).sum() == 1
        # kf1: feat5 was A → now B; feat0 was already B → one must drop
        row1 = np.array(m2.kf_assoc[1])
        assert (row1 == b).sum() == 1


class TestPointStats:
    def test_dmin_dmax_formulas(self):
        # MappingMath.h:32-41 oracle
        d, octv, levels, sf = 2.0, 1, 3, 2.0
        dmin, dmax = compute_dmin_dmax(jnp.float32(d), jnp.int32(octv), levels, sf)
        assert abs(float(dmax) - d * sf ** (levels - 1.5)) < 1e-5
        assert abs(float(dmin) - d * sf ** (-1.5)) < 1e-5
        assert int(predict_octave(jnp.float32(d), dmin, sf)) == octv

    def test_refresh_stats_mean_dir_and_medoid(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        # two keyframes at distinct centers
        p0 = Pose.identity()
        R1 = jnp.eye(3)
        t1 = jnp.array([-1.0, 0.0, 0.0])  # center at (1, 0, 0)
        m, _ = insert(m, rng, pose=p0)
        m, _ = insert(m, rng, pose=Pose(R1, t1))
        m, _ = insert(m, rng)  # third kf at origin
        pos = jnp.array([[0.0, 0.0, 4.0]])
        m, slots = create_map_points(
            m, pos, jnp.zeros((1, 8), jnp.uint32),
            jnp.array([0], jnp.int32), jnp.array([0], jnp.int32),
            jnp.array([1], jnp.int32), jnp.array([0], jnp.int32),
            jnp.array([True]),
        )
        s = int(slots[0])
        # also associate in kf2 feature 3
        m = m._replace(kf_assoc=m.kf_assoc.at[2, 3].set(s))
        touched = jnp.zeros((P_CAP,), bool).at[s].set(True)
        m = refresh_point_stats(m, touched, num_levels=3, scale_factor=2.0)
        # mean dir: normalize(normalize([0,0,4]) * 2 + normalize([-1,0,4]))
        d0 = np.array([0, 0, 4.0]); d0 /= np.linalg.norm(d0)
        d1 = np.array([-1, 0, 4.0]); d1 /= np.linalg.norm(d1)
        expect = 2 * d0 + d1
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(np.array(m.mp_mean_dir[s]), expect, atol=1e-5)
        # medoid descriptor is one of the three observing descriptors
        cands = [np.array(m.kf_desc[0, 0]), np.array(m.kf_desc[1, 0]),
                 np.array(m.kf_desc[2, 3])]
        assert any((np.array(m.mp_desc[s]) == c).all() for c in cands)
        assert float(m.mp_dmax[s]) > float(m.mp_dmin[s]) > 0

    def test_refresh_stats_slots_matches_full(self, rng):
        """refresh_point_stats_slots == refresh_point_stats on the same
        touched set (the hot mapping paths use the S-bounded variant)."""
        from mageslam_tpu.worldmap.map_state import refresh_point_stats_slots

        m = empty_map(K_CAP, P_CAP, N_CAP)
        poses = [Pose.identity(),
                 Pose(jnp.eye(3), jnp.array([-1.0, 0.0, 0.0])),
                 Pose(jnp.eye(3), jnp.array([0.0, -0.5, 0.2])),
                 Pose(jnp.eye(3), jnp.array([0.4, 0.1, -0.3]))]
        for p in poses:
            m, _ = insert(m, rng, pose=p)
        # a batch of points observed by random subsets of the keyframes
        n_pts = 20
        pos = jnp.asarray(rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
                          + np.array([0, 0, 5], np.float32))
        desc = jnp.asarray(rng.randint(0, 2**31, (n_pts, 8)), dtype=jnp.uint32)
        m, slots = create_map_points(
            m, pos, desc,
            jnp.asarray(rng.randint(0, 4, n_pts), dtype=jnp.int32),
            jnp.asarray(rng.randint(0, N_CAP, n_pts), dtype=jnp.int32),
            jnp.asarray(rng.randint(0, 3, n_pts), dtype=jnp.int32),
            jnp.asarray(rng.randint(0, N_CAP, n_pts), dtype=jnp.int32),
            jnp.ones((n_pts,), bool),
        )
        # extra random associations in the other keyframes
        assoc = np.array(m.kf_assoc)
        for i, s in enumerate(np.array(slots)):
            for k in range(4):
                if rng.rand() < 0.5:
                    f = rng.randint(0, N_CAP)
                    if assoc[k, f] < 0:
                        assoc[k, f] = s
        m = m._replace(kf_assoc=jnp.asarray(assoc))

        touched = jnp.zeros((P_CAP,), bool).at[slots].set(True)
        full = refresh_point_stats(m, touched, num_levels=3, scale_factor=2.0)
        # slot list with -1 padding and scrambled order
        pad = jnp.full((7,), -1, jnp.int32)
        slist = jnp.concatenate([slots[::-1], pad])
        by_slots = refresh_point_stats_slots(m, slist, num_levels=3,
                                             scale_factor=2.0)
        for name in ("mp_mean_dir", "mp_desc", "mp_dmin", "mp_dmax"):
            np.testing.assert_array_equal(
                np.array(getattr(full, name)), np.array(getattr(by_slots, name)),
                err_msg=name)


class TestCulling:
    def test_recent_culling_underobserved(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        m, k0 = insert(m, rng)
        m, k1 = insert(m, rng)
        m, slots = create_map_points(
            m, jnp.zeros((2, 3)), jnp.zeros((2, 8), jnp.uint32),
            jnp.array([0, 0], jnp.int32), jnp.array([0, 1], jnp.int32),
            jnp.array([1, 1], jnp.int32), jnp.array([0, 1], jnp.int32),
            jnp.array([True, True]),
        )
        # advance epochs: two more keyframes → age of points = 2
        m, k2 = insert(m, rng)
        m, k3 = insert(m, rng)
        failed = jnp.zeros((P_CAP,), bool)
        m2 = cull_recent_map_points(m, k3, failed, min_keyframes_for_culling=3)
        # both points have 2 observers < 3, age 2 (test applies at insertions
        # n+2/n+3, ThreadSafeMap.cpp:519-527), not seen in k3 → culled
        assert int(jnp.sum(m2.mp_valid)) == 0

    def test_recent_culling_grace_epoch(self, rng):
        """A point created at insertion n is EXEMPT from the under-observed
        test during insertion n+1 (history slot 0, idxPointSet==0 —
        ThreadSafeMap.cpp:519-527): culling it one insertion after creation
        would kill every triangulation that wasn't instantly re-tracked
        (measured: 92 of 226 init points at the 2nd keyframe)."""
        m = empty_map(K_CAP, P_CAP, N_CAP)
        m, k0 = insert(m, rng)
        m, k1 = insert(m, rng)
        m, slots = create_map_points(
            m, jnp.zeros((2, 3)), jnp.zeros((2, 8), jnp.uint32),
            jnp.array([0, 0], jnp.int32), jnp.array([0, 1], jnp.int32),
            jnp.array([1, 1], jnp.int32), jnp.array([0, 1], jnp.int32),
            jnp.array([True, True]),
        )
        m, k2 = insert(m, rng)   # age of points = 1: slot-0 grace
        m2 = cull_recent_map_points(m, k2, jnp.zeros((P_CAP,), bool),
                                    min_keyframes_for_culling=3)
        assert int(jnp.sum(m2.mp_valid)) == 2   # both survive the grace epoch

    def test_recent_culling_defers_if_seen_in_ki(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        m, k0 = insert(m, rng)
        m, k1 = insert(m, rng)
        m, slots = create_map_points(
            m, jnp.zeros((1, 3)), jnp.zeros((1, 8), jnp.uint32),
            jnp.array([0], jnp.int32), jnp.array([0], jnp.int32),
            jnp.array([1], jnp.int32), jnp.array([0], jnp.int32),
            jnp.array([True]),
        )
        s = int(slots[0])
        m, k2 = insert(m, rng)
        m, k3 = insert(m, rng)   # age 2: the under-observed test now applies
        m = m._replace(kf_assoc=m.kf_assoc.at[int(k3), 7].set(s))
        m2 = cull_recent_map_points(m, k3, jnp.zeros((P_CAP,), bool))
        assert bool(m2.mp_valid[s])  # deferred: seen in current keyframe

    def test_keyframe_cull_redundant(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        # 5 keyframes all observing the same 20 points at octave 0
        n_pts = 20
        for i in range(5):
            m, _ = insert(m, rng)
        m = m._replace(kf_kp_octave=jnp.zeros_like(m.kf_kp_octave))
        assoc = m.kf_assoc
        for k in range(5):
            assoc = assoc.at[k, :n_pts].set(jnp.arange(n_pts, dtype=jnp.int32))
        m = m._replace(
            kf_assoc=assoc,
            mp_valid=m.mp_valid.at[:n_pts].set(True),
        )
        covis = covisibility_matrix(m)
        assert int(covis[0, 1]) == n_pts
        m2, culled = cull_local_keyframes(m, jnp.int32(0), covis, num_levels=3,
                                          covis_theta=15)
        # newest redundant keyframe (slot 4) goes first
        assert bool(culled[4])
        assert not bool(m2.kf_valid[4])
        assert bool(m2.kf_valid[0])

    def test_keyframe_cull_loops_within_pass(self, rng):
        """The in-pass sweep culls newest-first until no keyframe is
        redundant against the UPDATED map (ThreadSafeMap::CullLocalKeyframes
        loop): 6 identical keyframes reduce to 3 (each point must keep
        MinimumKeyframeCovisibilityCount=3 equal-or-finer observers)."""
        m = empty_map(K_CAP, P_CAP, N_CAP)
        n_pts = 20
        for i in range(6):
            m, _ = insert(m, rng)
        m = m._replace(kf_kp_octave=jnp.zeros_like(m.kf_kp_octave))
        assoc = m.kf_assoc
        for k in range(6):
            assoc = assoc.at[k, :n_pts].set(jnp.arange(n_pts, dtype=jnp.int32))
        m = m._replace(kf_assoc=assoc, mp_valid=m.mp_valid.at[:n_pts].set(True))
        covis = covisibility_matrix(m)
        m2, culled = cull_local_keyframes(m, jnp.int32(0), covis, num_levels=3,
                                          covis_theta=15)
        assert np.asarray(culled)[[5, 4, 3]].all()       # newest-first
        assert not np.asarray(culled)[[0, 1, 2]].any()
        assert int(jnp.sum(m2.kf_valid)) == 3

    def test_immortal_never_culled(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        n_pts = 20
        for i in range(3):
            m, _ = insert(m, rng, immortal=True)
        m = m._replace(kf_kp_octave=jnp.zeros_like(m.kf_kp_octave))
        assoc = m.kf_assoc
        for k in range(3):
            assoc = assoc.at[k, :n_pts].set(jnp.arange(n_pts, dtype=jnp.int32))
        m = m._replace(kf_assoc=assoc, mp_valid=m.mp_valid.at[:n_pts].set(True))
        covis = covisibility_matrix(m)
        m2, culled = cull_local_keyframes(m, jnp.int32(0), covis, num_levels=3)
        assert not bool(jnp.any(culled))

    def test_remove_keyframe_kills_orphans(self, rng):
        m = empty_map(K_CAP, P_CAP, N_CAP)
        m, _ = insert(m, rng)
        m, _ = insert(m, rng)
        m, slots = create_map_points(
            m, jnp.zeros((1, 3)), jnp.zeros((1, 8), jnp.uint32),
            jnp.array([0], jnp.int32), jnp.array([0], jnp.int32),
            jnp.array([1], jnp.int32), jnp.array([0], jnp.int32),
            jnp.array([True]),
        )
        m2 = remove_keyframes(m, jnp.zeros((K_CAP,), bool).at[1].set(True))
        assert not bool(m2.mp_valid[slots[0]])  # only 1 observer left → dead


def _scene_map(rng, n_kf=4, n_pts=24):
    """Consistent multi-keyframe scene fixture shared by TestBAWindow and
    TestFidxParity (module-level so borrowing classes don't need an unbound
    method call; ADVICE r4)."""
    m = empty_map(K_CAP, P_CAP, N_CAP)
    pts = np.stack([
        rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
        rng.uniform(4, 8, n_pts),
    ], axis=1).astype(np.float32)
    # points must be valid BEFORE keyframe insertion: insert_keyframe drops
    # associations pointing at invalid point slots
    m = m._replace(
        mp_valid=m.mp_valid.at[:n_pts].set(True),
        mp_pos=m.mp_pos.at[:n_pts].set(jnp.array(pts)),
    )
    poses = []
    for i in range(n_kf):
        t = np.array([0.3 * i, 0.0, 0.0], np.float32)
        poses.append(Pose(jnp.eye(3), jnp.array(-t)))  # center at +t
    for i, p in enumerate(poses):
        Xc = np.array(p.transform(jnp.array(pts)))
        uv = np.stack([
            300 * Xc[:, 0] / Xc[:, 2] + 160, 300 * Xc[:, 1] / Xc[:, 2] + 120,
        ], axis=1).astype(np.float32)
        xy = jnp.zeros((N_CAP, 2)).at[:n_pts].set(jnp.array(uv))
        m, _ = insert_keyframe(
            m, p, CAM, jnp.int32(i), xy, jnp.zeros((N_CAP,), jnp.int32),
            jnp.zeros((N_CAP, 8), jnp.uint32),
            jnp.arange(N_CAP) < n_pts,
            jnp.where(jnp.arange(N_CAP) < n_pts,
                      jnp.arange(N_CAP, dtype=jnp.int32), -1),
            fixed=(i == 0), immortal=(i < 2),
        )
    return m, pts


class TestBAWindow:
    def _scene_map(self, rng, n_kf=4, n_pts=24):
        return _scene_map(rng, n_kf, n_pts)

    def test_window_assembly(self, rng):
        m, pts = self._scene_map(rng)
        w = build_local_ba_window(m, jnp.int32(3), max_cams=8, max_points=64,
                                  max_obs=256, theta0=15)
        # all 4 kfs covisible (40 shared ≥ 15), all in window → none fixed except kf0
        assert int(jnp.sum(w.problem.cam_valid)) == 4
        fixed = np.array(w.problem.cam_fixed)[np.array(w.problem.cam_valid)]
        assert fixed.sum() == 1
        assert int(jnp.sum(w.problem.pt_valid)) == 24
        assert int(jnp.sum(w.problem.obs_info > 0)) == 96
        # residuals at ground truth ≈ 0
        from mageslam_tpu.ba.residuals import observation_residuals
        res = observation_residuals(w.problem, w.problem.poses, w.problem.points,
                                    w.problem.obs_info, jnp.float32(0.0))
        active = np.array(w.problem.obs_info > 0)
        assert float(jnp.max(jnp.where(active, jnp.sum(res.r**2, -1), 0.0))) < 1e-4

    def test_ba_roundtrip_improves_map(self, rng):
        m, pts = self._scene_map(rng)
        # perturb keyframe 3's pose and some points
        bad = retract(Pose(m.kf_pose.R[3], m.kf_pose.t[3]),
                      jnp.array([0.02, -0.01, 0.015, 0.008, -0.006, 0.004]))
        m = m._replace(
            kf_pose=Pose(m.kf_pose.R.at[3].set(bad.R), m.kf_pose.t.at[3].set(bad.t)),
            mp_pos=m.mp_pos.at[:24].add(
                jnp.array(rng.normal(0, 0.01, (24, 3)), jnp.float32)),
        )
        w = build_local_ba_window(m, jnp.int32(3), max_cams=8, max_points=64,
                                  max_obs=256)
        st = BAState.from_problem(w.problem)
        st, mse, outliers = step_bundle_adjust(
            w.problem, st, jnp.zeros((12,), jnp.float32), jnp.float32(100.0))
        assert float(mse) < 1e-3
        m2 = apply_ba_results(m, w, st.poses, st.points, outliers,
                              num_levels=3, scale_factor=2.0)
        # keyframe 3 pose recovered to truth (identity R, t=-center)
        np.testing.assert_allclose(np.array(m2.kf_pose.R[3]), np.eye(3), atol=2e-3)
        np.testing.assert_allclose(np.array(m2.mp_pos[:24]), pts, atol=2e-2)
        # refinement counts bumped
        assert int(m2.mp_refine_count[0]) == 1
        # fixed kf0 untouched
        np.testing.assert_allclose(np.array(m2.kf_pose.t[0]), np.array(m.kf_pose.t[0]))


class TestSpanningTree:
    def test_builds_max_weight_tree(self):
        from mageslam_tpu.worldmap.spanning_tree import (
            essential_graph_edges, spanning_tree, tree_valid)

        K = 6
        covis = np.zeros((K, K), np.int32)
        # chain 0-1-2-3 with strong links, weak shortcut 0-3, node 4 linked to 2
        for a, b, w in [(0, 1, 50), (1, 2, 40), (2, 3, 30), (0, 3, 5), (2, 4, 20)]:
            covis[a, b] = covis[b, a] = w
        valid = jnp.array([True] * 5 + [False])
        parent = np.array(spanning_tree(jnp.asarray(covis), valid, 0))
        assert parent[0] == -1
        assert parent[1] == 0
        assert parent[2] == 1
        assert parent[3] == 2        # strong path, not the weak 0-3 shortcut
        assert parent[4] == 2
        assert parent[5] == -1       # invalid keyframe untouched
        assert bool(tree_valid(jnp.asarray(parent), valid, 0))

        # breaking the tree invalidates it
        bad = jnp.asarray(parent).at[3].set(-1)
        assert not bool(tree_valid(bad, valid, 0))

        edges = np.array(essential_graph_edges(jnp.asarray(covis), valid,
                                               jnp.asarray(parent), theta=45))
        assert edges[0, 1] and edges[1, 0]    # tree + strong
        assert edges[2, 3]                    # tree edge even though weak
        assert not edges[0, 3]                # weak non-tree edge excluded


class TestFidxParity:
    """The threaded feature-index membership (worldmap/member_index.py) must
    stay bit-equal to the association-derived tables it replaces: after every
    fidx-returning mutation, fidx == build_fidx(new_state), and the derived
    views (membership, octave histogram, per-slot stats refresh) match their
    scatter-based originals. This is the invariant behind the mapping core's
    one-scatter-per-event membership threading (runtime/pipeline.py
    mapping_body)."""

    def _map(self, rng):
        m, pts = _scene_map(rng, n_kf=5, n_pts=24)
        # octave variety so the histogram parity is non-trivial
        octv = jnp.array(rng.randint(0, 3, (K_CAP, N_CAP)), jnp.int32)
        return m._replace(kf_kp_octave=octv)

    def test_build_matches_scatter_forms(self, rng):
        from mageslam_tpu.worldmap.member_index import (build_fidx,
                                                        octave_histogram_of)

        m = self._map(rng)
        f = build_fidx(m)
        assert (np.array(f >= 0) == np.array(membership_matrix(m))).all()
        h_scatter = point_octave_histogram(m, 3)
        h_gather = octave_histogram_of(f, m.kf_kp_octave, 3)
        np.testing.assert_array_equal(np.array(h_scatter), np.array(h_gather))

    def test_mutations_keep_fidx_exact(self, rng):
        from mageslam_tpu.worldmap.member_index import build_fidx

        m = self._map(rng)
        f = build_fidx(m)

        # recent-point culling
        failed = jnp.zeros((P_CAP,), bool).at[:6].set(True)
        m1a = cull_recent_map_points(m, jnp.int32(4), failed)
        m1b, f1 = cull_recent_map_points(m, jnp.int32(4), failed, fidx=f)
        np.testing.assert_array_equal(np.array(m1a.mp_valid), np.array(m1b.mp_valid))
        np.testing.assert_array_equal(np.array(f1), np.array(build_fidx(m1b)))

        # keyframe removal (orphan sweep)
        rm = jnp.zeros((K_CAP,), bool).at[3].set(True)
        m2a = remove_keyframes(m1a, rm)
        m2b, f2 = remove_keyframes(m1b, rm, fidx=f1)
        np.testing.assert_array_equal(np.array(m2a.kf_assoc), np.array(m2b.kf_assoc))
        np.testing.assert_array_equal(np.array(f2), np.array(build_fidx(m2b)))

    def test_cull_local_keyframes_parity(self, rng):
        from mageslam_tpu.worldmap.member_index import build_fidx

        m = self._map(rng)
        covis = covisibility_matrix(m)
        a_state, a_culled = cull_local_keyframes(
            m, jnp.int32(0), covis, num_levels=3, covis_theta=15,
            max_tracking_point_overlap=0.5, min_keyframe_covis_count=3)
        b_state, b_culled, f_out = cull_local_keyframes(
            m, jnp.int32(0), covis, num_levels=3, covis_theta=15,
            max_tracking_point_overlap=0.5, min_keyframe_covis_count=3,
            fidx=build_fidx(m))
        np.testing.assert_array_equal(np.array(a_culled), np.array(b_culled))
        np.testing.assert_array_equal(np.array(a_state.kf_valid),
                                      np.array(b_state.kf_valid))
        np.testing.assert_array_equal(np.array(f_out),
                                      np.array(build_fidx(b_state)))

    def test_apply_ba_and_refresh_parity(self, rng):
        from mageslam_tpu.worldmap.map_state import refresh_point_stats_slots
        from mageslam_tpu.worldmap.member_index import build_fidx

        m = self._map(rng)
        w = build_local_ba_window(m, jnp.int32(3), max_cams=8, max_points=64,
                                  max_obs=256)
        st = BAState.from_problem(w.problem)
        st, _mse, _out = step_bundle_adjust(
            w.problem, st, jnp.zeros((4,), jnp.float32), jnp.float32(100.0))
        # force a couple of outliers so the unassociation path is exercised
        outliers = jnp.zeros_like(_out).at[:3].set(w.obs_kf[:3] >= 0)
        a = apply_ba_results(m, w, st.poses, st.points, outliers,
                             num_levels=3, scale_factor=2.0)
        b, f_out = apply_ba_results(m, w, st.poses, st.points, outliers,
                                    num_levels=3, scale_factor=2.0,
                                    fidx=build_fidx(m))
        np.testing.assert_array_equal(np.array(a.kf_assoc), np.array(b.kf_assoc))
        np.testing.assert_array_equal(np.array(a.mp_valid), np.array(b.mp_valid))
        np.testing.assert_allclose(np.array(a.mp_dmin), np.array(b.mp_dmin))
        np.testing.assert_array_equal(np.array(a.mp_desc), np.array(b.mp_desc))
        np.testing.assert_array_equal(np.array(f_out), np.array(build_fidx(b)))

        # window the same slots through the stats refresh both ways
        r_a = refresh_point_stats_slots(b, w.pt_slot, 3, 2.0)
        r_b = refresh_point_stats_slots(b, w.pt_slot, 3, 2.0,
                                        fidx=build_fidx(b))
        np.testing.assert_array_equal(np.array(r_a.mp_desc), np.array(r_b.mp_desc))
        np.testing.assert_allclose(np.array(r_a.mp_dmin), np.array(r_b.mp_dmin))
        np.testing.assert_allclose(np.array(r_a.mp_mean_dir),
                                   np.array(r_b.mp_mean_dir))
