"""SE(3) Lie-group operations in pure jnp.

Replaces the reference's Sophus usage (``src/core/TSDF.cpp:174-186,297-311``).
Twist layout matches Sophus: ``xi = [upsilon(3), omega(3)]`` — translation
first, rotation second — which is also the Jacobian row layout produced by
``kernel_computePoseGradients`` (``src/core/cuda/TSDF.cu:629-635``).

Poses are 4x4 float32 row-major matrices. All functions are jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _skew(w: jnp.ndarray) -> jnp.ndarray:
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    o = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([o, -wz, wy], axis=-1),
        jnp.stack([wz, o, -wx], axis=-1),
        jnp.stack([-wy, wx, o], axis=-1),
    ], axis=-2)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, Taylor-safe near zero."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = _skew(omega)
    K2 = K @ K
    # sin(t)/t and (1-cos(t))/t^2 with series fallback for tiny t
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2,
                  0.5 - theta2 / 24.0)
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle vector (robust away from theta=pi)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    sin_theta = jnp.sin(theta)
    small = jnp.abs(sin_theta) < 1e-6
    # Generic: w * theta / (2 sin(theta)); tiny angle: w / 2.
    scale = jnp.where(small, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * jnp.where(small, 1.0, sin_theta)))
    near_pi = theta > 3.0
    # Near pi: extract axis from diagonal of (R + I)/2.
    axis_sq = jnp.clip((jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]],
                                  axis=-1) + 1.0) * 0.5, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    signs = jnp.sign(jnp.where(jnp.abs(w) > 1e-12, w, 1.0))
    w_pi = axis * signs * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w * scale[..., None])


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist [upsilon, omega] -> 4x4 pose (Sophus convention)."""
    ups, omega = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = _skew(omega)
    K2 = K @ K
    R = so3_exp(omega)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2,
                  0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, (theta - jnp.sin(theta)) / (theta2 * theta),
                  1.0 / 6.0 - theta2 / 120.0)
    eye = jnp.eye(3, dtype=xi.dtype)
    V = eye + b[..., None, None] * K + c[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", V, ups)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 pose -> twist [upsilon, omega]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = so3_log(R)
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = _skew(omega)
    K2 = K @ K
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) K^2
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    denom = 2.0 * (1.0 - cos_t)
    coef = jnp.where(
        theta2 > 1e-8,
        (1.0 - theta * sin_t / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0))
        / theta2,
        1.0 / 12.0 + theta2 / 720.0)
    eye = jnp.eye(3, dtype=T.dtype)
    Vinv = eye - 0.5 * K + coef[..., None, None] * K2
    ups = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([ups, omega], axis=-1)


def pose_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def pose_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points of shape (..., 3)."""
    R = T[:3, :3]
    t = T[:3, 3]
    return points @ R.T + t


def reorthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize the rotation block via QR with positive-diagonal
    sign fix, reproducing ``TSDF::prepareTracking``
    (``src/core/TSDF.cpp:174-186``)."""
    R = T[..., :3, :3]
    Q, Rm = jnp.linalg.qr(R)
    signs = jnp.sign(jnp.diagonal(Rm, axis1=-2, axis2=-1))
    signs = jnp.where(signs == 0, 1.0, signs)
    Q = Q * signs[..., None, :]
    out = T.at[..., :3, :3].set(Q) if hasattr(T, "at") else T
    return out
