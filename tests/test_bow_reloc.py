"""BoW place recognition + relocalization tests.

BoW: trained vocabulary must retrieve the matching keyframe for a query made
of (a subset of) its descriptors, with the qualifying-score semantics of
OnlineBow::QueryUnknownImage. PnP: batched DLT-RANSAC recovers a camera pose
from 2D-3D matches with outliers. End-to-end: a session that loses tracking
(garbage frames) relocalizes when an already-seen view returns."""

import numpy as np
import jax
import jax.numpy as jnp

from mageslam_tpu.bow import empty_index, add_keyframe, query_keyframes, train_vocabulary
from mageslam_tpu.bow.index import compute_idf
from mageslam_tpu.geometry.pnp import pnp_ransac
from mageslam_tpu.geometry.se3 import Pose

from test_pipeline import CAM, W, H, frame_features, make_world, pose_at
from mageslam_tpu.runtime import SlamSession, TrackingState
from mageslam_tpu.ops.frontend import FrameFeatures


def rand_desc(rng, n):
    return jnp.array(rng.randint(0, 2**31, (n, 8)), jnp.uint32)


class TestBow:
    def test_query_retrieves_own_keyframe(self, rng):
        idx = empty_index(8, num_words=32)
        pool = rand_desc(rng, 512)
        anchors = train_vocabulary(pool, jnp.ones(512, bool), jax.random.PRNGKey(0),
                                   num_words=32)
        idx = idx._replace(anchors=anchors, trained=jnp.asarray(True))
        idx = compute_idf(idx, pool, jnp.ones(512, bool))

        # 4 keyframes with disjoint descriptor sets
        banks = [rand_desc(rng, 128) for _ in range(4)]
        for k, b in enumerate(banks):
            idx = add_keyframe(idx, jnp.int32(k), b, jnp.ones(128, bool))

        # query = noisy subset of keyframe 2's descriptors
        q = banks[2][:100]
        scores, qualified = query_keyframes(idx, q, jnp.ones(100, bool))
        assert int(jnp.argmax(scores)) == 2
        assert bool(qualified[2])

    def test_excluded_keyframes_not_returned(self, rng):
        idx = empty_index(8, num_words=32)
        pool = rand_desc(rng, 256)
        anchors = train_vocabulary(pool, jnp.ones(256, bool), jax.random.PRNGKey(1),
                                   num_words=32)
        idx = idx._replace(anchors=anchors)
        b = rand_desc(rng, 128)
        idx = add_keyframe(idx, jnp.int32(0), b, jnp.ones(128, bool))
        excl = jnp.zeros(8, bool).at[0].set(True)
        scores, qualified = query_keyframes(idx, b, jnp.ones(128, bool), exclude=excl)
        assert not bool(qualified[0])


class TestPnP:
    def test_recovers_pose_with_outliers(self, rng):
        n = 80
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(4, 8, n)], 1).astype(np.float32)
        from scipy.spatial.transform import Rotation
        R = Rotation.from_euler("xyz", (0.05, -0.1, 0.03)).as_matrix().astype(np.float32)
        t = np.array([0.3, -0.1, 0.2], np.float32)
        cam = np.array([300.0, 300.0, 160.0, 120.0], np.float32)
        Xc = pts @ R.T + t
        uv = np.stack([cam[0] * Xc[:, 0] / Xc[:, 2] + cam[2],
                       cam[1] * Xc[:, 1] / Xc[:, 2] + cam[3]], 1).astype(np.float32)
        uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
        uv[60:] += 80.0  # 25% gross outliers
        res = pnp_ransac(jnp.array(pts), jnp.array(uv), jnp.ones(n, bool),
                         jnp.array(cam), jax.random.PRNGKey(0),
                         max_reprojection_error=4.0, min_inliers=20, hypotheses=64)
        assert bool(res.ok)
        assert int(res.num_inliers) >= 55
        np.testing.assert_allclose(np.array(res.pose.R), R, atol=5e-3)
        np.testing.assert_allclose(np.array(res.pose.t), t, atol=3e-2)

    def test_fails_on_garbage(self, rng):
        n = 60
        pts = jnp.array(rng.uniform(-2, 2, (n, 3)), jnp.float32)
        uv = jnp.array(rng.uniform(0, 300, (n, 2)), jnp.float32)
        res = pnp_ransac(pts, uv, jnp.ones(n, bool),
                         jnp.array([300.0, 300.0, 160.0, 120.0]),
                         jax.random.PRNGKey(0), max_reprojection_error=4.0,
                         min_inliers=30, hypotheses=32)
        assert not bool(res.ok)


class TestRelocalization:
    def test_session_relocalizes_after_lost(self, rng):
        pts, descs = make_world(rng)
        sess = SlamSession(cam=CAM, image_width=int(W), image_height=int(H))

        # phase 1: track normally for 30 frames
        for i in range(30):
            t = i * 0.033
            sess.process_features(frame_features(pts, descs, pose_at(t), sess.N, rng),
                                  t, i)
        assert sess.initialized
        # reloc quality is gated on the ONLINE-RETRAINED vocabulary (15-frame
        # descriptor pool), not the provisional 2-frame init vocab
        assert sess._bow_retrained
        last_good_pose = pose_at(29 * 0.033)
        # the session's own (map-scale) estimate of that viewpoint — the
        # monocular gauge differs from world units
        last_tracked = [r for r in sess.results if r.state == TrackingState.TRACKING][-1]
        last_map_center = np.array(last_tracked.pose.center())

        # phase 2: feed garbage frames → tracking lost
        def garbage(i):
            n = sess.N
            xy = jnp.array(rng.uniform(20, 300, (n, 2)), jnp.float32)
            return FrameFeatures(
                xy=xy, und_xy=xy,
                response=jnp.full((n,), 10.0),
                octave=jnp.zeros((n,), jnp.int32),
                angle=jnp.zeros((n,), jnp.float32),
                desc=rand_desc(rng, n), valid=jnp.ones((n,), bool),
            )
        states = []
        for j in range(5):
            t = (30 + j) * 0.033
            r = sess.process_features(garbage(j), t, 30 + j)
            states.append(r.state)
        assert TrackingState.RELOCALIZING in states

        # phase 3: an already-seen viewpoint returns → relocalize
        reloc_states = []
        for j in range(3):
            t = (35 + j) * 0.033
            feats = frame_features(pts, descs, last_good_pose, sess.N, rng)
            r = sess.process_features(feats, t, 35 + j)
            reloc_states.append(r.state)
        assert TrackingState.TRACKING in reloc_states, reloc_states
        # recovered pose close to the revisited viewpoint IN MAP SCALE
        tracked = [r for r in sess.results[-3:] if r.state == TrackingState.TRACKING]
        est_c = np.array(tracked[-1].pose.center())
        err = np.linalg.norm(est_c - last_map_center)
        assert err < 0.1 * np.linalg.norm(last_map_center), err
