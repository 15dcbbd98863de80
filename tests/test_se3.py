import numpy as np
import jax.numpy as jnp
import pytest

from emfusion_tpu.geometry import (
    se3_exp, se3_log, so3_exp, so3_log, pose_inverse, reorthonormalize,
    transform_points,
)


def random_twist(rng, scale=1.0):
    return (rng.randn(6) * scale).astype(np.float32)


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-6, 1e-3, 0.1, 1.0, 2.0]:
        w = (rng.randn(3) * scale).astype(np.float32)
        R = so3_exp(jnp.asarray(w))
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)


def test_so3_orthonormal(rng):
    w = rng.randn(3).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99


def test_se3_exp_log_roundtrip(rng):
    for scale in [1e-6, 1e-2, 0.5, 1.5]:
        xi = random_twist(rng, scale)
        T = se3_exp(jnp.asarray(xi))
        xi2 = se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)


def test_se3_exp_identity():
    T = np.asarray(se3_exp(jnp.zeros(6)))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


def test_se3_exp_pure_translation():
    xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    T = np.asarray(se3_exp(xi))
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_pose_inverse(rng):
    xi = random_twist(rng)
    T = se3_exp(jnp.asarray(xi))
    I = np.asarray(T @ pose_inverse(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_transform_points(rng):
    xi = random_twist(rng, 0.5)
    T = se3_exp(jnp.asarray(xi))
    pts = rng.randn(10, 3).astype(np.float32)
    out = np.asarray(transform_points(T, jnp.asarray(pts)))
    expect = (np.asarray(T)[:3, :3] @ pts.T).T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_reorthonormalize(rng):
    xi = random_twist(rng, 0.5)
    T = np.asarray(se3_exp(jnp.asarray(xi)))
    T_noisy = T.copy()
    T_noisy[:3, :3] += rng.randn(3, 3).astype(np.float32) * 1e-3
    T_fixed = np.asarray(reorthonormalize(jnp.asarray(T_noisy)))
    R = T_fixed[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99
    # close to the original rotation
    np.testing.assert_allclose(R, T[:3, :3], atol=5e-3)
