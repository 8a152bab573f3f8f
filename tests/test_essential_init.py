"""5-point essential solver + monocular map initialization tests.

Oracle: synthetic two-view geometry with known relative pose; the solver must
recover an E whose decomposition contains the true (R, t) direction, and the
full init must bootstrap a map with correct structure up to scale."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from mageslam_tpu.geometry.essential import (
    decompose_essential,
    five_point_essential,
    triangulate_midpoint_pair,
)
from mageslam_tpu.geometry.se3 import Pose
from mageslam_tpu.tracking.map_init import InitSettings, try_initialize_pair


def two_view_scene(rng, n=100, baseline=(0.5, 0.05, 0.02), euler=(0.03, -0.05, 0.01)):
    # baseline |C| ≈ 0.5 keeps the unit-scale median triangulated depth under
    # the reference's MaxParallax3dMedianDistance=20 gate (MageSettings.h:105)
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(4, 9, n)], 1).astype(np.float32)
    R = Rotation.from_euler("xyz", euler).as_matrix().astype(np.float32)
    C = np.array(baseline, np.float32)           # camera-2 center
    t = (-R @ C).astype(np.float32)              # world→cam2 translation
    n1 = pts[:, :2] / pts[:, 2:3]
    Xc2 = pts @ R.T + t
    n2 = Xc2[:, :2] / Xc2[:, 2:3]
    E_true = skew(t) @ R                         # p2ᵀ [t]x R p1 = 0
    return pts, R, t, n1.astype(np.float32), n2.astype(np.float32), E_true


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float32)


class TestFivePoint:
    def test_recovers_true_essential(self, rng):
        pts, R, t, n1, n2, E_true = two_view_scene(rng)
        # several 5-point samples
        B = 8
        samples = np.stack([rng.choice(100, 5, replace=False) for _ in range(B)])
        E, valid = five_point_essential(jnp.array(n1[samples]), jnp.array(n2[samples]))
        E, valid = np.array(E), np.array(valid)
        assert valid.any()

        # at least one candidate satisfies the epipolar constraint for ALL points
        h1 = np.concatenate([n1, np.ones((100, 1), np.float32)], 1)
        h2 = np.concatenate([n2, np.ones((100, 1), np.float32)], 1)
        best_resid = np.inf
        for b in range(B):
            for r in range(E.shape[1]):
                if not valid[b, r]:
                    continue
                resid = np.abs(np.einsum("mi,ij,mj->m", h2, E[b, r], h1)).max()
                best_resid = min(best_resid, resid)
        assert best_resid < 1e-3, f"no candidate satisfies epipolar constraint: {best_resid}"

    def test_decomposition_contains_true_pose(self, rng):
        pts, R, t, n1, n2, E_true = two_view_scene(rng)
        E_n = E_true / np.linalg.norm(E_true)
        poses = decompose_essential(jnp.array(E_n))
        # one of the 4 candidates must match (R, t-direction)
        t_dir = t / np.linalg.norm(t)
        found = False
        for i in range(4):
            Ri = np.array(poses.R[i])
            ti = np.array(poses.t[i])
            if np.allclose(Ri, R, atol=1e-4) and np.allclose(ti, t_dir, atol=1e-4):
                found = True
        assert found

    def test_cheirality_votes_for_true_pose(self, rng):
        pts, R, t, n1, n2, E_true = two_view_scene(rng)
        E_n = jnp.array(E_true / np.linalg.norm(E_true))
        poses = decompose_essential(E_n)
        best, best_front = -1, -1
        for i in range(4):
            p = Pose(poses.R[i], poses.t[i])
            X = triangulate_midpoint_pair(p, jnp.array(n1), jnp.array(n2))
            z1 = np.array(X[:, 2])
            z2 = np.array(p.transform(X)[:, 2])
            front = int(((z1 > 0) & (z2 > 0)).sum())
            if front > best_front:
                best, best_front = i, front
        np.testing.assert_allclose(np.array(poses.R[best]), R, atol=1e-4)
        assert best_front == 100


class TestMapInit:
    def _features(self, rng, pts, R, t, K, noise=0.0):
        fx, fy, cx, cy = K
        def project(Rm, tm):
            Xc = pts @ Rm.T + tm
            return np.stack([fx * Xc[:, 0] / Xc[:, 2] + cx,
                             fy * Xc[:, 1] / Xc[:, 2] + cy], 1).astype(np.float32)
        uv1 = project(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        uv2 = project(R, t)
        uv1 += rng.normal(0, noise, uv1.shape).astype(np.float32)
        uv2 += rng.normal(0, noise, uv2.shape).astype(np.float32)
        return uv1, uv2

    def test_initializes_two_frames(self, rng):
        n = 120
        pts, R, t, _, _, _ = two_view_scene(rng, n=n)
        K = (300.0, 300.0, 160.0, 120.0)
        uv1, uv2 = self._features(rng, pts, R, t, K, noise=0.2)
        # distinctive random descriptors: identical across the two frames
        desc = jnp.array(np.random.RandomState(5).randint(0, 2**31, (n, 8)), jnp.uint32)
        # shuffle frame-2 feature order to exercise matching
        perm = rng.permutation(n)
        result = try_initialize_pair(
            jnp.array(uv1), desc, jnp.ones(n, bool),
            jnp.array(uv2[perm]), desc[perm], jnp.ones(n, bool),
            jnp.array(K), jax.random.PRNGKey(0),
            InitSettings(), ransac_batch=64,
        )
        assert bool(result.succeeded), f"init failed, matches={int(result.match_count)}"
        n_pts = int(jnp.sum(result.point_valid))
        assert n_pts >= 60

        # recovered pose matches truth up to scale
        C_true = -R.T @ t
        C_est = np.array(result.pose2.center())
        scale = np.linalg.norm(C_true) / np.linalg.norm(C_est)
        np.testing.assert_allclose(np.array(result.pose2.R), R, atol=5e-3)
        np.testing.assert_allclose(C_est * scale, C_true, atol=2e-2)

        # triangulated structure matches up to the same scale
        ok = np.array(result.point_valid)
        X = np.array(result.points)[ok] * scale
        # depth error grows ~quadratically with distance; 0.2 px noise at z≈9
        # gives up to ~0.5 units — loose absolute tolerance, tight median
        err = np.abs(X - pts[np.array(result.feat1)[ok]])
        assert np.median(err) < 0.05, np.median(err)
        assert err.max() < 1.0, err.max()

    def test_rejects_pure_rotation(self, rng):
        """No-translation pair carries no parallax → init must fail
        (the reference's pose-dissimilarity/cheirality gates)."""
        n = 120
        pts, _, _, _, _, _ = two_view_scene(rng, n=n)
        K = (300.0, 300.0, 160.0, 120.0)
        R = Rotation.from_euler("xyz", (0.02, 0.04, -0.01)).as_matrix().astype(np.float32)
        uv1, uv2 = self._features(rng, pts, R, np.zeros(3, np.float32), K, noise=0.3)
        desc = jnp.array(np.random.RandomState(5).randint(0, 2**31, (n, 8)), jnp.uint32)
        result = try_initialize_pair(
            jnp.array(uv1), desc, jnp.ones(n, bool),
            jnp.array(uv2), desc, jnp.ones(n, bool),
            jnp.array(K), jax.random.PRNGKey(0),
            InitSettings(), ransac_batch=64,
        )
        assert not bool(result.succeeded)

    def test_rejects_too_few_matches(self, rng):
        n = 120
        pts, R, t, _, _, _ = two_view_scene(rng, n=n)
        K = (300.0, 300.0, 160.0, 120.0)
        uv1, uv2 = self._features(rng, pts, R, t, K)
        desc1 = jnp.array(rng.randint(0, 2**31, (n, 8)), jnp.uint32)
        desc2 = jnp.array(rng.randint(0, 2**31, (n, 8)), jnp.uint32)  # unrelated
        result = try_initialize_pair(
            jnp.array(uv1), desc1, jnp.ones(n, bool),
            jnp.array(uv2), desc2, jnp.ones(n, bool),
            jnp.array(K), jax.random.PRNGKey(0),
            InitSettings(), ransac_batch=32,
        )
        assert not bool(result.succeeded)
