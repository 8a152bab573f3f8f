"""Bundle adjustment tests: analytic Jacobians vs autodiff, pose-only LM
convergence vs scipy oracle, full Schur BA on synthetic multi-view problems,
tether constraints, outlier extraction semantics (BundlerLib.cpp:388-436)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import least_squares
from scipy.spatial.transform import Rotation

from mageslam_tpu.ba import BAProblem, BAState, optimize_pose, step_bundle_adjust
from mageslam_tpu.ba.problem import (
    TETHER_DISTANCE,
    TETHER_TRANSFORM,
    empty_problem,
)
from mageslam_tpu.ba.residuals import observation_residuals, tether_residuals
from mageslam_tpu.ba.schur import lm_iteration
from mageslam_tpu.geometry.se3 import Pose, exp_se3, retract


def make_scene(rng, n_pts=120, n_cams=3, noise=0.0):
    """Synthetic scene: points in a box in front of a ring of cameras."""
    pts = np.stack(
        [
            rng.uniform(-2, 2, n_pts),
            rng.uniform(-1.5, 1.5, n_pts),
            rng.uniform(4, 8, n_pts),
        ],
        axis=1,
    ).astype(np.float32)
    K = np.array([300.0, 300.0, 160.0, 120.0], np.float32)
    poses, uvs = [], []
    for i in range(n_cams):
        rot = Rotation.from_euler("xyz", rng.uniform(-0.05, 0.05, 3)).as_matrix()
        t = np.array([0.4 * i, 0.02 * i, 0.1 * rng.uniform()], np.float32)
        R = rot.astype(np.float32)
        Xc = pts @ R.T + t
        uv = np.stack(
            [
                K[0] * Xc[:, 0] / Xc[:, 2] + K[2],
                K[1] * Xc[:, 1] / Xc[:, 2] + K[3],
            ],
            axis=1,
        ).astype(np.float32)
        uv += rng.normal(0, noise, uv.shape).astype(np.float32)
        poses.append((R, t))
        uvs.append(uv)
    return pts, K, poses, uvs


class TestJacobians:
    def test_obs_jacobians_match_autodiff(self, rng):
        pts, K, poses, uvs = make_scene(rng, n_pts=20, n_cams=2)
        p = empty_problem(2, 20, 40)
        R = jnp.stack([jnp.array(poses[0][0]), jnp.array(poses[1][0])])
        t = jnp.stack([jnp.array(poses[0][1]), jnp.array(poses[1][1])])
        obs_cam = jnp.array([i for i in range(2) for _ in range(20)], jnp.int32)
        obs_pt = jnp.array(list(range(20)) * 2, jnp.int32)
        # perturb so residuals are non-zero
        uv_meas = jnp.concatenate([jnp.array(uvs[0]), jnp.array(uvs[1])]) + 0.5
        p = p._replace(
            poses=Pose(R, t),
            intrinsics=jnp.tile(jnp.array(K)[None], (2, 1)),
            cam_valid=jnp.ones(2, bool),
            points=jnp.array(pts),
            pt_valid=jnp.ones(20, bool),
            obs_cam=obs_cam,
            obs_pt=obs_pt,
            obs_uv=uv_meas,
            obs_info=jnp.ones(40),
        )
        res = observation_residuals(p, p.poses, p.points, p.obs_info, jnp.float32(0.0))

        def r_of_twist(xi, points):
            poses2 = jax.vmap(lambda x, Rp, tp: exp_se3(x).compose(Pose(Rp, tp)))(
                xi, R, t
            )
            r, _, _, _, _ = observation_residuals(
                p, poses2, points, p.obs_info, jnp.float32(0.0)
            )[:5]
            return r

        Jc_auto = jax.jacfwd(r_of_twist, argnums=0)(jnp.zeros((2, 6)), p.points)
        Jp_auto = jax.jacfwd(r_of_twist, argnums=1)(jnp.zeros((2, 6)), p.points)
        # gather the relevant blocks
        Jc_expected = Jc_auto[jnp.arange(40), :, obs_cam]     # (O, 2, 6)
        Jp_expected = Jp_auto[jnp.arange(40), :, obs_pt]      # (O, 2, 3)
        np.testing.assert_allclose(res.Jc, Jc_expected, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(res.Jp, Jp_expected, rtol=1e-4, atol=1e-3)


class TestPoseOnly:
    def test_recovers_perturbed_pose(self, rng):
        pts, K, poses, uvs = make_scene(rng, n_pts=150, n_cams=1)
        R0, t0 = poses[0]
        true_pose = Pose(jnp.array(R0), jnp.array(t0))
        twist = jnp.array([0.05, -0.03, 0.08, 0.02, -0.015, 0.01])
        bad_pose = retract(true_pose, twist)
        info = jnp.ones(150)
        est, chi2, depth = optimize_pose(
            bad_pose, jnp.array(K), jnp.array(pts), jnp.array(uvs[0]), info,
            huber_width=0.0, num_iters=10,
        )
        np.testing.assert_allclose(est.R, true_pose.R, atol=1e-4)
        np.testing.assert_allclose(est.t, true_pose.t, atol=1e-3)
        assert float(jnp.max(chi2)) < 1e-4
        assert bool(jnp.all(depth > 0))

    def test_matches_scipy_with_noise_and_huber(self, rng):
        pts, K, poses, uvs = make_scene(rng, n_pts=200, n_cams=1, noise=0.7)
        R0, t0 = poses[0]
        true_pose = Pose(jnp.array(R0), jnp.array(t0))
        bad_pose = retract(true_pose, jnp.array([0.03, 0.02, -0.04, 0.01, 0.02, -0.01]))
        info = jnp.ones(200)
        est, _, _ = optimize_pose(
            bad_pose, jnp.array(K), jnp.array(pts), jnp.array(uvs[0]), info,
            huber_width=1.8, num_iters=15,
        )

        def resid(x):
            p = retract(bad_pose, jnp.array(x, dtype=jnp.float32))
            Xc = np.asarray(p.transform(jnp.array(pts)))
            uv = np.stack(
                [K[0] * Xc[:, 0] / Xc[:, 2] + K[2], K[1] * Xc[:, 1] / Xc[:, 2] + K[3]],
                axis=1,
            )
            return (uvs[0] - uv).ravel()

        sol = least_squares(resid, np.zeros(6), loss="huber", f_scale=1.8, xtol=1e-12)
        ref_pose = retract(bad_pose, jnp.array(sol.x, dtype=jnp.float32))
        # both should land on (nearly) the same robust optimum
        np.testing.assert_allclose(est.R, ref_pose.R, atol=5e-4)
        np.testing.assert_allclose(est.t, ref_pose.t, atol=5e-3)

    def test_masked_points_ignored(self, rng):
        pts, K, poses, uvs = make_scene(rng, n_pts=100, n_cams=1)
        R0, t0 = poses[0]
        true_pose = Pose(jnp.array(R0), jnp.array(t0))
        uv = np.array(uvs[0])
        uv[50:] += 500.0  # garbage in masked slots
        info = jnp.array([1.0] * 50 + [0.0] * 50)
        bad_pose = retract(true_pose, jnp.array([0.02, 0.0, 0.03, 0.01, 0.0, -0.01]))
        est, _, _ = optimize_pose(
            bad_pose, jnp.array(K), jnp.array(pts), jnp.array(uv), info,
            huber_width=0.0, num_iters=10,
        )
        np.testing.assert_allclose(est.R, true_pose.R, atol=1e-4)
        np.testing.assert_allclose(est.t, true_pose.t, atol=1e-3)


def build_problem(pts, K, poses, uvs, n_cam_slots=8, n_pt_slots=256, n_obs_slots=1024,
                  fixed=(0,), noise_pts=0.0, rng=None):
    n_cams, n_pts = len(poses), pts.shape[0]
    p = empty_problem(n_cam_slots, n_pt_slots, n_obs_slots)
    R = np.stack([po[0] for po in poses])
    t = np.stack([po[1] for po in poses])
    R_bank = np.tile(np.eye(3, dtype=np.float32), (n_cam_slots, 1, 1))
    t_bank = np.zeros((n_cam_slots, 3), np.float32)
    R_bank[:n_cams], t_bank[:n_cams] = R, t
    pt_bank = np.zeros((n_pt_slots, 3), np.float32)
    noisy = pts + (rng.normal(0, noise_pts, pts.shape).astype(np.float32)
                   if noise_pts else 0.0)
    pt_bank[:n_pts] = noisy
    obs_cam = np.zeros(n_obs_slots, np.int32)
    obs_pt = np.zeros(n_obs_slots, np.int32)
    obs_uv = np.zeros((n_obs_slots, 2), np.float32)
    obs_info = np.zeros(n_obs_slots, np.float32)
    k = 0
    for c in range(n_cams):
        for j in range(n_pts):
            obs_cam[k], obs_pt[k], obs_uv[k] = c, j, uvs[c][j]
            obs_info[k] = 1.0
            k += 1
    cam_fixed = np.zeros(n_cam_slots, bool)
    for f in fixed:
        cam_fixed[f] = True
    return p._replace(
        poses=Pose(jnp.array(R_bank), jnp.array(t_bank)),
        intrinsics=jnp.tile(jnp.array(K)[None], (n_cam_slots, 1)),
        cam_fixed=jnp.array(cam_fixed),
        cam_valid=jnp.array(np.arange(n_cam_slots) < n_cams),
        points=jnp.array(pt_bank),
        pt_valid=jnp.array(np.arange(n_pt_slots) < n_pts),
        obs_cam=jnp.array(obs_cam),
        obs_pt=jnp.array(obs_pt),
        obs_uv=jnp.array(obs_uv),
        obs_info=jnp.array(obs_info),
    )


class TestFullBA:
    def test_converges_on_perturbed_scene(self, rng):
        pts, K, poses, uvs = make_scene(rng, n_pts=120, n_cams=3)
        # perturb camera 2 and all points; cameras 0,1 fixed at truth (gauge+scale)
        perturbed = list(poses[:2])
        for R0, t0 in poses[2:]:
            p_ = retract(Pose(jnp.array(R0), jnp.array(t0)),
                         jnp.array(rng.uniform(-0.02, 0.02, 6), dtype=jnp.float32))
            perturbed.append((np.array(p_.R), np.array(p_.t)))
        problem = build_problem(pts, K, perturbed, uvs, fixed=(0, 1),
                                noise_pts=0.02, rng=rng)
        state = BAState.from_problem(problem)
        state, mse, outliers = step_bundle_adjust(
            problem, state, jnp.full((15,), 0.0, jnp.float32), jnp.float32(100.0)
        )
        assert float(mse) < 1e-3, f"BA did not converge, mse={float(mse)}"
        # fixed cameras untouched
        np.testing.assert_allclose(state.poses.t[0], perturbed[0][1], atol=1e-7)
        np.testing.assert_allclose(state.poses.t[1], perturbed[1][1], atol=1e-7)
        # free camera recovered (cam2 true pose)
        np.testing.assert_allclose(state.poses.R[2], poses[2][0], atol=2e-3)

    def test_cost_monotone_nonincreasing(self, rng):
        pts, K, poses, uvs = make_scene(rng, n_pts=80, n_cams=3, noise=0.5)
        problem = build_problem(pts, K, poses, uvs, fixed=(0,), noise_pts=0.05, rng=rng)
        state = BAState.from_problem(problem)
        costs = []
        for _ in range(8):
            res = lm_iteration(problem, state, jnp.float32(1.8))
            state = res.state
            costs.append(float(res.cost))
        assert all(b <= a + 1e-3 for a, b in zip(costs, costs[1:])), costs

    def test_outlier_extraction(self, rng):
        pts, K, poses, uvs = make_scene(rng, n_pts=100, n_cams=2)
        uvs0 = np.array(uvs[0])
        uvs0[7] += 60.0   # gross outlier
        uvs0[23] += 45.0
        problem = build_problem(pts, K, poses, [uvs0, uvs[1]], fixed=(0, 1))
        state = BAState.from_problem(problem)
        state, mse, outliers = step_bundle_adjust(
            problem, state, jnp.full((3,), 1.8, jnp.float32), jnp.float32(7.25**2)
        )
        out_idx = np.where(np.array(outliers))[0]
        assert 7 in out_idx and 23 in out_idx
        assert float(mse) < 7.25**2
        # removed observations have zero information now
        assert float(state.obs_info[7]) == 0.0

    def test_points_fixed_mode(self, rng):
        pts, K, poses, uvs = make_scene(rng, n_pts=60, n_cams=2)
        problem = build_problem(pts, K, poses, uvs, fixed=(0,))
        problem = problem._replace(points_fixed=True)
        # perturb camera 1
        bad = retract(Pose(problem.poses.R[1], problem.poses.t[1]),
                      jnp.array([0.02, -0.01, 0.03, 0.005, 0.01, -0.005]))
        Rb = problem.poses.R.at[1].set(bad.R)
        tb = problem.poses.t.at[1].set(bad.t)
        problem = problem._replace(poses=Pose(Rb, tb))
        state = BAState.from_problem(problem)
        state, mse, _ = step_bundle_adjust(
            problem, state, jnp.zeros((10,), jnp.float32), jnp.float32(100.0)
        )
        assert float(mse) < 1e-4
        np.testing.assert_allclose(state.points, problem.points, atol=0)  # untouched
        np.testing.assert_allclose(state.poses.R[1], poses[1][0], atol=1e-3)


class TestTethers:
    def test_distance_tether_scales_baseline(self, rng):
        """Two cameras with only a distance tether and fixed points: translation
        distance converges toward the measured distance (EdgeScaleConstraint)."""
        pts, K, poses, uvs = make_scene(rng, n_pts=50, n_cams=2)
        problem = build_problem(pts, K, poses, uvs, fixed=(0,))
        t_dist = float(np.linalg.norm(poses[1][1] - poses[0][1]))
        problem = problem._replace(
            tether_kind=problem.tether_kind.at[0].set(TETHER_DISTANCE),
            tether_cam1=problem.tether_cam1.at[0].set(0),
            tether_cam2=problem.tether_cam2.at[0].set(1),
            tether_distance=problem.tether_distance.at[0].set(t_dist),
            tether_weight=problem.tether_weight.at[0].set(50.0),
        )
        teth = tether_residuals(problem, problem.poses)
        np.testing.assert_allclose(float(teth.r[0, 0]), 0.0, atol=1e-4)
        # perturbing camera 1 translation creates tether error
        t2 = problem.poses.t.at[1].add(jnp.array([0.3, 0.0, 0.0]))
        teth2 = tether_residuals(problem, Pose(problem.poses.R, t2))
        assert abs(float(teth2.r[0, 0])) > 1.0  # weighted error

    def test_transform_tether_holds_stereo_rig(self, rng):
        """EXTRINSIC tether (g2o EdgeSE3Expmap): with a strong tether, BA keeps
        the relative transform at the measurement (Stereo/StereoMapInit tethers,
        MageSettings.h:135-147)."""
        pts, K, poses, uvs = make_scene(rng, n_pts=80, n_cams=2)
        T1 = Pose(jnp.array(poses[0][0]), jnp.array(poses[0][1]))
        T2 = Pose(jnp.array(poses[1][0]), jnp.array(poses[1][1]))
        delta = T2.compose(T1.inverse())  # cam1→cam2 view-transform delta
        problem = build_problem(pts, K, poses, uvs, fixed=(0,), noise_pts=0.01, rng=rng)
        problem = problem._replace(
            tether_kind=problem.tether_kind.at[0].set(TETHER_TRANSFORM),
            tether_cam1=problem.tether_cam1.at[0].set(0),
            tether_cam2=problem.tether_cam2.at[0].set(1),
            tether_pose=Pose(
                problem.tether_pose.R.at[0].set(delta.R),
                problem.tether_pose.t.at[0].set(delta.t),
            ),
            tether_weight=problem.tether_weight.at[0].set(1000.0),
        )
        state = BAState.from_problem(problem)
        state, mse, _ = step_bundle_adjust(
            problem, state, jnp.zeros((10,), jnp.float32), jnp.float32(100.0)
        )
        T2f = Pose(state.poses.R[1], state.poses.t[1])
        T1f = Pose(state.poses.R[0], state.poses.t[0])
        delta_f = T2f.compose(T1f.inverse())
        np.testing.assert_allclose(delta_f.R, delta.R, atol=1e-3)
        np.testing.assert_allclose(delta_f.t, delta.t, atol=1e-2)


class TestPoseGraph:
    def test_sim3_roundtrip(self, rng):
        from mageslam_tpu.ba.pose_graph import Sim3, sim3_exp, sim3_log

        xi = jnp.array(rng.uniform(-0.2, 0.2, 7), dtype=jnp.float32)
        g = sim3_exp(xi)
        np.testing.assert_allclose(np.array(sim3_log(g)), np.array(xi), atol=1e-5)
        # compose/inverse
        h = sim3_exp(jnp.array(rng.uniform(-0.2, 0.2, 7), dtype=jnp.float32))
        ident = g.compose(g.inverse())
        np.testing.assert_allclose(np.array(ident.R), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(float(ident.s), 1.0, atol=1e-5)

    def test_closes_drifted_loop(self, rng):
        """Ring of poses with accumulated drift + one loop edge: the pose
        graph distributes the error (the PoseGraphOptimizer workload)."""
        from mageslam_tpu.ba.pose_graph import (
            PoseGraphProblem, Sim3, optimize_pose_graph, sim3_log)

        K = 8
        # true poses: identity rotation, translations around a line
        true_t = np.stack([np.linspace(0, 7, K), np.zeros(K), np.zeros(K)], 1)
        # drifted estimates: each step adds a small bias
        drift = np.cumsum(np.tile([0.05, 0.03, 0.0], (K, 1)) *
                          (np.arange(K) > 0)[:, None], axis=0)
        est_t = (true_t + drift).astype(np.float32)
        verts = Sim3(jnp.ones(K), jnp.tile(jnp.eye(3)[None], (K, 1, 1)),
                     jnp.asarray(est_t))

        # odometry edges from TRUE relative transforms + a loop edge 0→K-1
        ei, ej, meas_t = [], [], []
        for a in range(K - 1):
            ei.append(a); ej.append(a + 1)
            meas_t.append(true_t[a + 1] - true_t[a])
        ei.append(0); ej.append(K - 1)
        meas_t.append(true_t[K - 1] - true_t[0])
        E = len(ei)
        meas = Sim3(jnp.ones(E), jnp.tile(jnp.eye(3)[None], (E, 1, 1)),
                    jnp.asarray(np.array(meas_t, np.float32)))
        problem = PoseGraphProblem(
            vertices=verts,
            fixed=jnp.asarray(np.arange(K) == 0),
            valid=jnp.ones(K, bool),
            edge_i=jnp.asarray(ei, dtype=jnp.int32),
            edge_j=jnp.asarray(ej, dtype=jnp.int32),
            edge_meas=meas,
            edge_weight=jnp.ones(E),
        )
        out = optimize_pose_graph(problem, iterations=15)
        err_before = np.abs(est_t - true_t).max()
        err_after = np.abs(np.array(out.t) - true_t).max()
        assert err_after < err_before * 0.05, (err_before, err_after)
        np.testing.assert_allclose(np.array(out.s), 1.0, atol=1e-2)


class TestIterateDriver:
    def test_iterate_bundle_adjust_policy(self, rng):
        """BundleAdjustTask driver semantics: shrinking Huber/outlier schedule
        with MSE early-out (BundleAdjust.h:202-244)."""
        from mageslam_tpu.ba.step import iterate_bundle_adjust

        pts, K, poses, uvs = make_scene(rng, n_pts=80, n_cams=3)
        problem = build_problem(pts, K, poses, uvs, fixed=(0, 1),
                                noise_pts=0.02, rng=rng)
        state = BAState.from_problem(problem)
        active0 = np.array(state.obs_info > 0)
        state, mse, steps, outliers = iterate_bundle_adjust(
            problem, state, huber_width=1.8, max_outlier_error=7.25,
            huber_width_scale=0.95, max_outlier_error_scale=0.95,
            min_mean_square_error=1e-4, num_steps=20, steps_per_run=2,
        )
        assert float(mse) < 1e-3
        assert steps <= 20
        # persisted lambda carried in the state (MappingWorker.cpp:272-286)
        assert float(state.lam) > 0
        # cumulative outlier mask == observations deactivated across all runs
        np.testing.assert_array_equal(
            np.array(outliers), active0 & ~np.array(state.obs_info > 0))

    def test_iterate_min_steps_overrides_mse_early_out(self, rng):
        """MinSteps keeps the loop running past the MSE target
        (MappingWorker.cpp:360: mse > target OR steps < MinSteps)."""
        from mageslam_tpu.ba.step import iterate_bundle_adjust

        pts, K, poses, uvs = make_scene(rng, n_pts=80, n_cams=3)
        problem = build_problem(pts, K, poses, uvs, fixed=(0, 1),
                                noise_pts=0.0, rng=rng)
        state = BAState.from_problem(problem)
        # zero-noise problem: mse is below any target from step 1, so only
        # min_steps can keep it iterating
        _, _, steps, _ = iterate_bundle_adjust(
            problem, state, huber_width=1.8, max_outlier_error=7.25,
            huber_width_scale=0.95, max_outlier_error_scale=0.95,
            min_mean_square_error=1e6, num_steps=10, steps_per_run=1,
            min_steps=4,
        )
        assert steps == 4
