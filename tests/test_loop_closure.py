"""Loop closure tests: connected-component clustering, detection on a
synthetically drifted map (two copies of the same place with offset poses and
duplicate points), and closing (pose correction + point merge)."""

import numpy as np
import jax
import jax.numpy as jnp

from mageslam_tpu.bow import add_keyframe, compute_idf, empty_index, train_vocabulary
from mageslam_tpu.geometry.se3 import Pose
from mageslam_tpu.runtime.loop_closure import (
    _connected_components,
    close_loop,
    detect_loop,
)
from mageslam_tpu.tracking.frame_state import TrackedFrame
from mageslam_tpu.worldmap import empty_map
from mageslam_tpu.worldmap.operations import insert_keyframe

K_CAP, P_CAP, N_CAP = 16, 256, 64
CAM = jnp.array([300.0, 300.0, 160.0, 90.0])


class TestComponents:
    def test_connected_components(self):
        K = 8
        adj = jnp.zeros((K, K), bool)
        # component {1,2,3} and {5,6}; 0 isolated active; 4 inactive
        for a, b in [(1, 2), (2, 3), (5, 6)]:
            adj = adj.at[a, b].set(True).at[b, a].set(True)
        active = jnp.array([True, True, True, True, False, True, True, False])
        labels = np.array(_connected_components(adj, active))
        assert labels[1] == labels[2] == labels[3] == 1
        assert labels[5] == labels[6] == 5
        assert labels[0] == 0
        assert labels[4] == K  # inactive


def build_drifted_map(rng, drift=np.array([0.4, 0.1, 0.0], np.float32),
                      scale=1.0):
    """Two copies of the same place: region A (truth) and region B drifted by
    `drift` AND scaled by `scale` about the origin (monocular scale drift).
    B's cameras scale with the map so B's projections match A's exactly."""
    n_pts = 40
    pts = np.stack([rng.uniform(-1.5, 1.5, n_pts), rng.uniform(-1, 1, n_pts),
                    rng.uniform(4, 7, n_pts)], 1).astype(np.float32)
    descs = rng.randint(0, 2**31, (n_pts, 8)).astype(np.uint32)
    pts_b = (scale * pts + drift).astype(np.float32)

    m = empty_map(K_CAP, P_CAP, N_CAP)
    P2 = 2 * n_pts
    m = m._replace(
        mp_valid=m.mp_valid.at[:P2].set(True),
        mp_pos=m.mp_pos.at[:n_pts].set(jnp.asarray(pts))
                       .at[n_pts:P2].set(jnp.asarray(pts_b)),
        mp_desc=m.mp_desc.at[:n_pts].set(jnp.asarray(descs))
                         .at[n_pts:P2].set(jnp.asarray(descs)),
        mp_dmin=m.mp_dmin.at[:P2].set(0.1),
        mp_dmax=m.mp_dmax.at[:P2].set(50.0),
        mp_mean_dir=m.mp_mean_dir.at[:P2, 2].set(1.0),
    )

    def features(pose, world_pts):
        Xc = np.array(pose.transform(jnp.asarray(world_pts)))
        uv = np.stack([300 * Xc[:, 0] / Xc[:, 2] + 160,
                       300 * Xc[:, 1] / Xc[:, 2] + 90], 1).astype(np.float32)
        xy = np.full((N_CAP, 2), -1e6, np.float32)
        xy[:n_pts] = uv
        d = np.zeros((N_CAP, 8), np.uint32)
        d[:n_pts] = descs
        return jnp.asarray(xy), jnp.asarray(d), jnp.arange(N_CAP) < n_pts

    poses_a = [Pose(jnp.eye(3), jnp.array([-0.08 * i, 0.0, 0.0])) for i in range(3)]
    # region B keyframes: same viewpoints, drifted + scaled with the map.
    # Camera center c_b = s·c_a + drift ⇒ t_b = s·t_a − R·drift (R = I here),
    # which preserves the projections of the scaled points exactly.
    poses_b = [Pose(jnp.eye(3), scale * p.t - jnp.asarray(drift, jnp.float32))
               for p in poses_a]

    frames = []
    for i, p in enumerate(poses_a):
        xy, d, valid = features(p, pts)
        assoc = jnp.where(jnp.arange(N_CAP) < n_pts,
                          jnp.arange(N_CAP, dtype=jnp.int32), -1)
        m, _ = insert_keyframe(m, p, CAM, jnp.int32(i), xy,
                               jnp.zeros((N_CAP,), jnp.int32), d, valid, assoc)
        frames.append((xy, d, valid, assoc, p))
    for i, p in enumerate(poses_b):
        xy, d, valid = features(p, pts_b)
        assoc = jnp.where(jnp.arange(N_CAP) < n_pts,
                          jnp.arange(N_CAP, dtype=jnp.int32) + n_pts, -1)
        m, _ = insert_keyframe(m, p, CAM, jnp.int32(10 + i), xy,
                               jnp.zeros((N_CAP,), jnp.int32), d, valid, assoc)
        frames.append((xy, d, valid, assoc, p))
    from mageslam_tpu.worldmap.map_state import refresh_membership
    m = refresh_membership(m)

    # BoW over everything
    bow = empty_index(K_CAP, num_words=32)
    pool = m.kf_desc[0].reshape(-1, 8)
    pool_valid = m.kf_kp_valid[0]
    anchors = train_vocabulary(pool, pool_valid, jax.random.PRNGKey(0), num_words=32)
    bow = bow._replace(anchors=anchors, trained=jnp.asarray(True))
    bow = compute_idf(bow, pool, pool_valid)
    for k in range(6):
        bow = add_keyframe(bow, jnp.int32(k), m.kf_desc[k], m.kf_kp_valid[k])
    return m, bow, frames, pts, descs, n_pts


class TestLoopClosure:
    def test_detect_and_close(self, rng):
        drift = np.array([0.4, 0.1, 0.0], np.float32)
        m, bow, frames, pts, descs, n_pts = build_drifted_map(rng, drift)
        # Ki = slot 5 (last drifted keyframe)
        xy, d, valid, assoc, pose = frames[5]
        frame = TrackedFrame(
            pose=pose, cam=CAM, kp_xy=xy,
            kp_octave=jnp.zeros((N_CAP,), jnp.int32), desc=d, kp_valid=valid,
            assoc=assoc, timestamp=np.float32(0.5), frame_id=np.int32(12),
        )
        det = detect_loop(
            m, bow, frame, jnp.int32(5), jax.random.PRNGKey(3),
            min_keyframes=5, min_cluster_size=2,
        )
        assert bool(det.detected), "loop not detected"
        # cluster = region A keyframes
        cm = np.array(det.cluster_mask)
        assert cm[:3].sum() >= 2 and not cm[3:6].any()
        # reloc pose ≈ the undrifted pose of Ki's viewpoint
        true_pose = frames[2][4]  # pose_a[2] — same viewpoint, undrifted map
        np.testing.assert_allclose(np.array(det.reloc_pose.t),
                                   np.array(true_pose.t), atol=2e-2)
        assert abs(float(det.scale) - 1.0) < 0.1

        m2 = close_loop(m, det, frame, jnp.int32(5))
        # Ki's pose corrected to the undrifted location
        np.testing.assert_allclose(np.array(m2.kf_pose.t[5]),
                                   np.array(true_pose.t), atol=3e-2)
        # duplicate points merged: Ki's duplicates (slots n..2n seen by Ki)
        # retargeted into region A's points
        assoc5 = np.array(m2.kf_assoc[5])
        merged = (assoc5 >= 0) & (assoc5 < n_pts)
        assert merged.sum() > n_pts * 0.8, merged.sum()

    def test_close_corrects_scale_drift(self, rng):
        """Monocular scale drift: region B is the same place scaled ×1.3 and
        translated. Closing must apply the SIMILARITY (not just the rigid
        part): keyframe baselines and surviving map points return to region
        A's scale (LoopClosureWorker.cpp:296-374 similarity semantics)."""
        drift = np.array([0.5, 0.15, 0.0], np.float32)
        s_drift = 1.3
        m, bow, frames, pts, descs, n_pts = build_drifted_map(
            rng, drift, scale=s_drift)
        xy, d, valid, assoc, pose = frames[5]
        # only the first 30 keypoints valid in Ki's frame → points 30..40 of
        # region B are never merge candidates and must survive as MOVED points
        n_vis = 30
        valid = valid & (jnp.arange(N_CAP) < n_vis)
        assoc = jnp.where(valid, assoc, -1)
        frame = TrackedFrame(
            pose=pose, cam=CAM, kp_xy=xy,
            kp_octave=jnp.zeros((N_CAP,), jnp.int32), desc=d, kp_valid=valid,
            assoc=assoc, timestamp=np.float32(0.5), frame_id=np.int32(12),
        )
        det = detect_loop(
            m, bow, frame, jnp.int32(5), jax.random.PRNGKey(3),
            min_keyframes=5, min_cluster_size=2,
        )
        assert bool(det.detected), "loop not detected under scale drift"
        # depth-ratio scale ≈ 1/s_drift
        assert abs(float(det.scale) - 1.0 / s_drift) < 0.06, float(det.scale)

        # pre-closure scale error: B keyframe baseline is s_drift × truth
        c_pre = np.array(m.kf_pose.center())
        base_pre = np.linalg.norm(c_pre[3] - c_pre[4])
        assert abs(base_pre - s_drift * 0.08) < 1e-3

        m2 = close_loop(m, det, frame, jnp.int32(5))
        # post-closure: baselines at region A scale, poses at region A places
        c_post = np.array(m2.kf_pose.center())
        base_post = np.linalg.norm(c_post[3] - c_post[4])
        assert abs(base_post - 0.08) < 0.08 * 0.05, base_post
        true_pose = frames[2][4]
        np.testing.assert_allclose(np.array(m2.kf_pose.t[5]),
                                   np.array(true_pose.t), atol=3e-2)
        # surviving moved points land on region A positions
        mp_pos = np.array(m2.mp_pos)
        mp_valid = np.array(m2.mp_valid)
        moved = [j for j in range(n_pts) if mp_valid[n_pts + j]]
        assert moved, "expected some unmerged region-B points"
        err = np.linalg.norm(
            np.stack([mp_pos[n_pts + j] - pts[j] for j in moved]), axis=1)
        assert float(err.max()) < 0.05, err.max()
        # dMin/dMax rescaled
        np.testing.assert_allclose(
            np.array(m2.mp_dmin)[n_pts:2 * n_pts][np.array(moved)],
            0.1 / s_drift, rtol=0.06)

    def test_essential_graph_distributes_drift(self, rng):
        """A 12-keyframe circuit with progressive monocular scale drift.
        After the closed-form close corrects only the loop end, the Sim(3)
        essential graph must distribute the correction over the interior
        keyframes (OptimizeEssentialGraph role): mid-chain pose error and
        point error shrink by >4x, and the datum + corrected ends stay put."""
        from mageslam_tpu.runtime.loop_closure import essential_graph_refine
        from mageslam_tpu.worldmap.map_state import refresh_membership

        NK, G = 12, 16                       # keyframes, points per group
        s_tot = 1.3
        th = 2 * np.pi * np.arange(NK) / NK
        c_true = np.stack([2 * np.sin(th), np.zeros(NK), 2 * np.cos(th)],
                          1).astype(np.float32)
        # monocular drift composes LOCALLY: each odometry step's translation
        # is scaled by the growing local-scale error s_k (cluster kf 0-2
        # exact), c'_k = c'_{k-1} + s_k (c_k − c_{k-1})
        s_k = s_tot ** (np.maximum(np.arange(NK) - 2, 0) / 9.0)
        c_drift = c_true.copy()
        for k in range(3, NK):
            c_drift[k] = c_drift[k - 1] + s_k[k] * (c_true[k] - c_true[k - 1])

        # point groups on an outer ring; group g is first observed (and
        # triangulated) by kf g-1, so it inherits that frame's local scale:
        # p' = c'_{g-1} + s_{g-1} (p − c_{g-1})
        base = np.stack([3.5 * np.sin(th), np.zeros(NK), 3.5 * np.cos(th)], 1)
        pts_true = (base[:, None, :] + rng.uniform(-0.5, 0.5, (NK, G, 3))
                    ).astype(np.float32)                     # (NK, G, 3)
        own = np.maximum(np.arange(NK) - 1, 0)
        pts_drift = (c_drift[own][:, None, :] + s_k[own][:, None, None]
                     * (pts_true - c_true[own][:, None, :])).astype(np.float32)

        move = np.zeros(NK, bool); move[[10, 11]] = True
        cluster = np.zeros(NK, bool); cluster[:3] = True
        # post-closed-form state: moved kfs at truth, their points (groups
        # 10, 11 — seen by kf 10/11, not by the cluster) corrected to truth;
        # group 0 is datum; kf 11 observes group 0 via the merge
        kf_c = np.where(move[:, None] | cluster[:, None], c_true, c_drift)
        pt_now = pts_drift.copy()
        pt_now[0] = pts_true[0]
        pt_now[10] = pts_true[10]
        pt_now[11] = pts_true[11]

        m = empty_map(K_CAP, P_CAP, N_CAP)
        P2 = NK * G
        m = m._replace(
            mp_valid=m.mp_valid.at[:P2].set(True),
            mp_pos=m.mp_pos.at[:P2].set(jnp.asarray(pt_now.reshape(-1, 3))),
            mp_dmin=m.mp_dmin.at[:P2].set(0.1),
            mp_dmax=m.mp_dmax.at[:P2].set(50.0),
            mp_mean_dir=m.mp_mean_dir.at[:P2, 2].set(1.0),
        )
        assoc_rows = np.full((K_CAP, N_CAP), -1, np.int32)
        for k in range(NK):
            g2 = 0 if k == NK - 1 else k + 1   # loop merge: kf 11 sees group 0
            assoc_rows[k, :G] = np.arange(k * G, (k + 1) * G)
            assoc_rows[k, G:2 * G] = np.arange(g2 * G, (g2 + 1) * G)
        m = m._replace(
            kf_valid=m.kf_valid.at[:NK].set(True),
            kf_order=m.kf_order.at[:NK].set(jnp.arange(NK)),
            kf_frame_id=m.kf_frame_id.at[:NK].set(jnp.arange(NK)),
            kf_pose=Pose(
                m.kf_pose.R,
                m.kf_pose.t.at[:NK].set(jnp.asarray(-kf_c))),  # R=I → t=-c
            kf_cam=m.kf_cam.at[:NK].set(CAM),
            kf_kp_valid=m.kf_kp_valid.at[:NK, :2 * G].set(True),
            kf_assoc=jnp.asarray(assoc_rows),
        )
        m = refresh_membership(m)
        pre_pose = Pose(m.kf_pose.R, m.kf_pose.t.at[:NK].set(
            jnp.asarray(-c_drift)))
        # pre-merge covisibility: the kf11<->kf0 connection didn't exist
        from mageslam_tpu.worldmap.covisibility import covisibility_matrix
        pre_cv = covisibility_matrix(m).at[11, 0].set(0).at[0, 11].set(0)

        m2 = essential_graph_refine(
            m, pre_pose,
            jnp.asarray(np.pad(move, (0, K_CAP - NK))),
            jnp.asarray(np.pad(cluster, (0, K_CAP - NK))),
            jnp.float32(1.0 / s_tot), jnp.int32(11),
            pre_covis=pre_cv, iterations=25)

        c0 = np.array(m.kf_pose.center())[:NK]
        c1 = np.array(m2.kf_pose.center())[:NK]
        mid = slice(3, 10)
        err_pre = np.linalg.norm(c0[mid] - c_true[mid], axis=1)
        err_post = np.linalg.norm(c1[mid] - c_true[mid], axis=1)
        assert err_pre.max() > 0.15                    # drift is material
        assert err_post.max() < err_pre.max() / 4, (err_pre.max(),
                                                    err_post.max())
        # datum fixed; corrected ends held near truth by the loop block
        # (they are soft-constrained, not frozen — ORB-SLAM semantics)
        ends = np.array([0, 1, 2, 10, 11])
        assert np.linalg.norm(c1[ends] - c_true[ends], axis=1).max() < 3e-2
        # interior points follow their keyframes (no double correction of
        # the already-corrected groups 10/11 or the datum group 0)
        p1 = np.array(m2.mp_pos)[:P2].reshape(NK, G, 3)
        pt_err_post = np.linalg.norm(p1 - pts_true, axis=-1)
        pt_err_pre = np.linalg.norm(pt_now - pts_true, axis=-1)
        assert pt_err_post.max() < max(pt_err_pre.max() / 4, 0.05), (
            pt_err_pre.max(), pt_err_post.max())

    def test_stale_slot_identity_guards(self, rng):
        """Deferred application (chunk/stream path) can trail detection by
        up to depth×chunk frames of in-scan mapping; a keyframe/point slot
        culled and RE-USED in that window still passes plain validity masks.
        close_loop must drop stale-identity cluster members and merge pairs
        (LoopDetection.kf_frame_id / mp_order captures — ADVICE r3)."""
        from mageslam_tpu.worldmap.map_state import refresh_membership

        drift = np.array([0.4, 0.1, 0.0], np.float32)
        m, bow, frames, pts, descs, n_pts = build_drifted_map(rng, drift)
        # make A-point 7 ALSO observed by moved keyframe 5 (spare keypoint
        # slot): normally datum-protected (seen by the cluster) → unmoved
        m = m._replace(
            kf_assoc=m.kf_assoc.at[5, n_pts + 1].set(7),
            kf_kp_valid=m.kf_kp_valid.at[5, n_pts + 1].set(True))
        m = refresh_membership(m)
        xy, d, valid, assoc, pose = frames[5]
        frame = TrackedFrame(
            pose=pose, cam=CAM, kp_xy=xy,
            kp_octave=jnp.zeros((N_CAP,), jnp.int32), desc=d, kp_valid=valid,
            assoc=assoc, timestamp=np.float32(0.5), frame_id=np.int32(12),
        )
        det = detect_loop(
            m, bow, frame, jnp.int32(5), jax.random.PRNGKey(3),
            min_keyframes=5, min_cluster_size=2,
        )
        assert bool(det.detected)
        assert det.kf_frame_id is not None and det.mp_order is not None

        # identities unchanged → guards are no-ops: point 7 stays (datum),
        # duplicates merge
        m_live = close_loop(m, det, frame, jnp.int32(5))
        np.testing.assert_allclose(np.array(m_live.mp_pos[7]), pts[7],
                                   atol=1e-5)
        assoc5 = np.array(m_live.kf_assoc[5])
        assert ((assoc5 >= 0) & (assoc5 < n_pts)).sum() > n_pts * 0.8

        # simulate in-flight slot reuse between dispatch and apply:
        # merge dst (A-point 2) and merge src (B-point n_pts+3) re-created
        m_stale = m._replace(
            mp_created_order=m.mp_created_order.at[2].set(77)
                                               .at[n_pts + 3].set(78))
        m2 = close_loop(m_stale, det, frame, jnp.int32(5))
        assoc5 = np.array(m2.kf_assoc[5])
        assert assoc5[2] == n_pts + 2, "stale dst slot must not merge"
        assert assoc5[3] == n_pts + 3, "stale src slot must not merge"
        merged = (assoc5 >= 0) & (assoc5 < n_pts)
        assert merged.sum() > n_pts * 0.7      # the rest still merges

        # all cluster keyframe slots re-used → datum protection lapses for
        # their points: A-point 7 (also seen by the moved set) now moves
        m_stale2 = m._replace(
            kf_frame_id=m.kf_frame_id.at[0].set(990).at[1].set(991)
                                     .at[2].set(992))
        m3 = close_loop(m_stale2, det, frame, jnp.int32(5))
        moved_d = np.linalg.norm(np.array(m3.mp_pos[7]) - pts[7])
        assert moved_d > 0.05, moved_d

    def test_no_loop_without_candidates(self, rng):
        m, bow, frames, pts, descs, n_pts = build_drifted_map(rng)
        # Ki covisible with everything similar → query for region-A keyframe 0
        xy, d, valid, assoc, pose = frames[0]
        frame = TrackedFrame(
            pose=pose, cam=CAM, kp_xy=xy,
            kp_octave=jnp.zeros((N_CAP,), jnp.int32), desc=d, kp_valid=valid,
            assoc=assoc, timestamp=np.float32(0.0), frame_id=np.int32(0),
        )
        det = detect_loop(m, bow, frame, jnp.int32(0), jax.random.PRNGKey(1),
                          min_keyframes=20)   # min-keyframe gate fails
        assert not bool(det.detected)
