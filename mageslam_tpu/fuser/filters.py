"""Error-state EKF for visual-inertial fusion, functional and jit-friendly.

The reference wraps internal `ST::` Kalman filters behind SensorFilter3Dof /
SensorFilter6Dof / SensorFilterSimple6Dof (FuserLib SensorFilter.h:99-157);
those internals were never open-sourced. This is a standard error-state EKF
built for TPU: fixed-shape state, batched matrix algebra, no branches.

State (16): q (w,x,y,z) body→world, p world, v world, bg gyro bias, ba accel
bias. Error state (15): [δθ, δp, δv, δbg, δba].

  predict: strapdown IMU integration + first-order covariance propagation
  update_pose: visual pose observation (world→camera R, t → body pose with
               identity camera-to-body by default)
  update_gravity (3DoF mode): accelerometer direction observation — what the
               reference's WaitForGravityConverge mode runs
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose, hat, quat_to_rot

GRAVITY = 9.80665


class EkfState(NamedTuple):
    q: jax.Array      # (4,) unit quaternion body→world
    p: jax.Array      # (3,)
    v: jax.Array      # (3,)
    bg: jax.Array     # (3,)
    ba: jax.Array     # (3,)
    P: jax.Array      # (15, 15) error covariance


def ekf_init(
    q: jax.Array | None = None,
    p: jax.Array | None = None,
    att_var: float = 1e-2, pos_var: float = 1e-2, vel_var: float = 1e-1,
    bg_var: float = 1e-4, ba_var: float = 1e-2,
) -> EkfState:
    P = jnp.diag(jnp.concatenate([
        jnp.full((3,), att_var), jnp.full((3,), pos_var), jnp.full((3,), vel_var),
        jnp.full((3,), bg_var), jnp.full((3,), ba_var),
    ]))
    return EkfState(
        q=q if q is not None else jnp.array([1.0, 0.0, 0.0, 0.0]),
        p=p if p is not None else jnp.zeros(3),
        v=jnp.zeros(3),
        bg=jnp.zeros(3),
        ba=jnp.zeros(3),
        P=P,
    )


def _quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    w1, x1, y1, z1 = a[0], a[1], a[2], a[3]
    w2, x2, y2, z2 = b[0], b[1], b[2], b[3]
    return jnp.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _small_quat(dtheta: jax.Array) -> jax.Array:
    half = 0.5 * dtheta
    w = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(half * half), 1e-12))
    return jnp.concatenate([w[None], half])


def ekf_predict(
    state: EkfState, gyro: jax.Array, accel: jax.Array, dt: jax.Array,
    gyro_noise: float = 1e-3, accel_noise: float = 1e-2,
    gyro_bias_walk: float = 1e-6, accel_bias_walk: float = 1e-5,
) -> EkfState:
    """Strapdown propagation with one IMU sample over dt."""
    w = gyro - state.bg
    a = accel - state.ba
    R = quat_to_rot(state.q)
    g = jnp.array([0.0, 0.0, -GRAVITY])

    q_new = _quat_mul(state.q, _small_quat(w * dt))
    q_new = q_new / jnp.maximum(jnp.linalg.norm(q_new), 1e-12)
    a_world = R @ a + g
    v_new = state.v + a_world * dt
    p_new = state.p + state.v * dt + 0.5 * a_world * dt * dt

    # error-state transition F (15×15)
    eye = jnp.eye(3)
    F = jnp.eye(15)
    F = F.at[0:3, 0:3].set(eye - hat(w) * dt)
    F = F.at[0:3, 9:12].set(-eye * dt)
    F = F.at[3:6, 6:9].set(eye * dt)
    F = F.at[6:9, 0:3].set(-R @ hat(a) * dt)
    F = F.at[6:9, 12:15].set(-R * dt)

    Q = jnp.diag(jnp.concatenate([
        jnp.full((3,), gyro_noise**2 * dt),
        jnp.zeros((3,)),
        jnp.full((3,), accel_noise**2 * dt),
        jnp.full((3,), gyro_bias_walk**2 * dt),
        jnp.full((3,), accel_bias_walk**2 * dt),
    ]))
    P_new = F @ state.P @ F.T + Q
    return EkfState(q=q_new, p=p_new, v=v_new, bg=state.bg, ba=state.ba, P=P_new)


def _inject(state: EkfState, dx: jax.Array) -> EkfState:
    q = _quat_mul(state.q, _small_quat(dx[0:3]))
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    return state._replace(
        q=q, p=state.p + dx[3:6], v=state.v + dx[6:9],
        bg=state.bg + dx[9:12], ba=state.ba + dx[12:15],
    )


def _kalman(state: EkfState, H: jax.Array, r: jax.Array, Rm: jax.Array) -> EkfState:
    S = H @ state.P @ H.T + Rm
    K = state.P @ H.T @ jnp.linalg.inv(S)
    dx = K @ r
    IKH = jnp.eye(15) - K @ H
    P = IKH @ state.P @ IKH.T + K @ Rm @ K.T
    return _inject(state, dx)._replace(P=P)


def ekf_update_pose(state: EkfState, visual_pose: Pose,
                    pos_noise: float = 1e-2, rot_noise: float = 1e-2,
                    pose_cov: jax.Array | None = None) -> EkfState:
    """Visual pose update: world→camera pose observation (camera ≡ body).
    Measurement: body position p_m = camera center, attitude R_m = R_wcᵀ.

    pose_cov, when given, is the (6, 6) reprojection-derived covariance in
    [rho(3), phi(3)] twist order (fuser.covariance.estimate_pose_covariance
    ↔ Fuser::EstimatePoseCovariance, Fuser.h:51-75); its blocks are permuted
    into the filter's [attitude, position] measurement order and floored by
    the scalar noise defaults."""
    p_m = visual_pose.center()
    R_m = jnp.swapaxes(visual_pose.R, -1, -2)       # body→world
    R = quat_to_rot(state.q)
    # attitude residual: log(Rᵀ R_m) ≈ vee(Rᵀ R_m - I)
    dR = R.T @ R_m
    r_att = 0.5 * jnp.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0],
                             dR[1, 0] - dR[0, 1]])
    r = jnp.concatenate([r_att, p_m - state.p])
    H = jnp.zeros((6, 15))
    H = H.at[0:3, 0:3].set(jnp.eye(3))
    H = H.at[3:6, 3:6].set(jnp.eye(3))
    floor = jnp.diag(jnp.concatenate([
        jnp.full((3,), rot_noise**2), jnp.full((3,), pos_noise**2)]))
    if pose_cov is None:
        Rm = floor
    else:
        perm = jnp.array([3, 4, 5, 0, 1, 2])        # [rho,phi] → [att,pos]
        Rm = pose_cov[perm][:, perm] + floor
    return _kalman(state, H, r, Rm)


def ekf_update_rotation(state: EkfState, visual_pose: Pose,
                        rot_noise: float = 1e-2,
                        rot_cov: jax.Array | None = None) -> EkfState:
    """3DoF visual update: attitude only (SensorFilter3Dof::
    AddVisualRotationUpdate, SensorFilter.h:99-112) — position states are
    untouched, for the VISUAL_INERTIAL_FUSION_WITH_3DOF filter mode."""
    R_m = jnp.swapaxes(visual_pose.R, -1, -2)
    R = quat_to_rot(state.q)
    dR = R.T @ R_m
    r = 0.5 * jnp.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0],
                         dR[1, 0] - dR[0, 1]])
    H = jnp.zeros((3, 15))
    H = H.at[0:3, 0:3].set(jnp.eye(3))
    Rm = jnp.eye(3) * rot_noise**2
    if rot_cov is not None:
        Rm = rot_cov + Rm
    return _kalman(state, H, r, Rm)


def ekf_update_gravity(state: EkfState, accel: jax.Array,
                       noise: float = 0.5) -> EkfState:
    """3DoF gravity-direction update (WaitForGravityConverge mode): the
    accelerometer, at low dynamics, measures -g in the body frame."""
    R = quat_to_rot(state.q)
    pred = R.T @ jnp.array([0.0, 0.0, GRAVITY])      # expected accel (static)
    a_dir = accel / jnp.maximum(jnp.linalg.norm(accel), 1e-9) * GRAVITY
    r = a_dir - pred
    H = jnp.zeros((3, 15))
    H = H.at[0:3, 0:3].set(hat(pred))
    Rm = jnp.eye(3) * noise**2
    return _kalman(state, H, r, Rm)


def pose_from_state(state: EkfState) -> Pose:
    """World→camera pose prior from the filter (IMUPosePriorProvider)."""
    R_wb = quat_to_rot(state.q)
    R_cw = R_wb.T
    t = -R_cw @ state.p
    return Pose(R_cw, t)


def gravity_in_body(state: EkfState) -> jax.Array:
    return quat_to_rot(state.q).T @ jnp.array([0.0, 0.0, -GRAVITY])
