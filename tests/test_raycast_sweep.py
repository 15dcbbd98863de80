"""Sweep raycast vs the lock-step reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from emfusion_tpu.ops.fusion import compute_gradients
from emfusion_tpu.ops.raycast import raycast_volume
from emfusion_tpu.ops.raycast_sweep import raycast_sweep


def sphere_volume(res, voxel, radius, trunc):
    g = (np.arange(res) - (res - 1) / 2.0) * voxel
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    d = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - radius
    tsdf = np.clip(d / trunc, -1, 1).astype(np.float32)
    weights = np.ones_like(tsdf)
    return tsdf, weights


def make_intr(H, W, f=60.0):
    return jnp.array([[f, 0, W / 2 - 0.5], [0, f, H / 2 - 0.5], [0, 0, 1]],
                     dtype=jnp.float32)


def _rot(axis, deg):
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


@pytest.mark.parametrize("axis,deg", [("z", 0), ("y", 20), ("x", 15)])
def test_sweep_matches_lockstep(axis, deg):
    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))
    H, W = 48, 64
    intr = make_intr(H, W)
    rot = jnp.asarray(_rot(axis, deg))
    rel_t = -rot @ jnp.array([0.0, 0.0, -1.5])  # camera 1.5 m out
    rel_t = jnp.asarray(np.array([0.0, 0.0, -1.5], np.float32))
    rel_r = rot

    ref = raycast_volume(jnp.asarray(tsdf), grads, jnp.asarray(weights),
                         rel_r, rel_t, intr, voxel, trunc, H, W,
                         max_steps=512)
    swp = raycast_sweep(jnp.asarray(tsdf), jnp.asarray(weights),
                        rel_r, rel_t, intr, voxel, trunc, H, W,
                        oversample=1.5)

    m_ref = np.asarray(ref["mask"])
    m_swp = np.asarray(swp["mask"])
    agree = (m_ref == m_swp).mean()
    assert agree > 0.97, f"mask agreement {agree:.3f}"

    both = m_ref & m_swp
    if both.sum() > 0:
        dt = np.abs(np.asarray(ref["raylengths"]) -
                    np.asarray(swp["raylengths"]))[both]
        assert np.median(dt) < voxel, np.median(dt)
        assert np.quantile(dt, 0.9) < 2 * voxel

    # normals roughly agree away from silhouette edges
    n_ref = np.asarray(ref["normals"])
    n_swp = np.asarray(swp["normals"])
    valid = both & (np.linalg.norm(n_swp, axis=0) > 0.5)
    # erode to interior
    from scipy.ndimage import binary_erosion
    interior = binary_erosion(valid, iterations=2)
    if interior.sum() > 20:
        dots = np.sum(n_ref * n_swp, axis=0)[interior]
        assert np.median(dots) > 0.95, np.median(dots)


def test_sweep_zero_weight_no_hit():
    res, voxel, radius, trunc = 32, 0.1, 0.5, 0.5
    tsdf, _ = sphere_volume(res, voxel, radius, trunc)
    H, W = 24, 32
    intr = make_intr(H, W, 40.0)
    out = raycast_sweep(jnp.asarray(tsdf), jnp.zeros((res, res, res)),
                        jnp.eye(3), jnp.array([0.0, 0.0, -1.2]), intr,
                        voxel, trunc, H, W)
    assert not np.asarray(out["mask"]).any()


def test_sweep_prev_raylength_composite():
    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    H, W = 16, 16
    intr = make_intr(H, W, 20.0)
    prev = jnp.full((H, W), 0.5)
    out = raycast_sweep(jnp.asarray(tsdf), jnp.asarray(weights),
                        jnp.eye(3), jnp.array([0.0, 0.0, -1.5]), intr,
                        voxel, trunc, H, W, prev_raylengths=prev)
    assert not np.asarray(out["mask"]).any()


def test_sweep_backface_culled():
    """Camera inside the sphere looking out: first crossing along the ray
    is - -> + (backface) — no hit, like the reference early-out."""
    res, voxel, radius, trunc = 64, 0.05, 0.9, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    H, W = 16, 16
    intr = make_intr(H, W, 20.0)
    out = raycast_sweep(jnp.asarray(tsdf), jnp.asarray(weights),
                        jnp.eye(3), jnp.zeros(3), intr,
                        voxel, trunc, H, W)
    cy, cx = H // 2, W // 2
    assert not np.asarray(out["mask"])[cy, cx]


def test_sweep_scan_axis_pitched_camera():
    """Camera looking along volume +x: sweeping the relabeled axis must
    match the lock-step march (the default z sweep would see only
    grazing slices)."""
    from emfusion_tpu.ops.fusion_pencil import pick_scan_axis

    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))
    H, W = 48, 64
    intr = make_intr(H, W)
    rel_r = jnp.asarray(_rot("y", 90))            # cam z -> vol x
    rel_t = jnp.asarray(np.array([-1.5, 0.0, 0.0], np.float32))
    ax = pick_scan_axis(np.asarray(rel_r))
    assert ax == 0

    ref = raycast_volume(jnp.asarray(tsdf), grads, jnp.asarray(weights),
                         rel_r, rel_t, intr, voxel, trunc, H, W,
                         max_steps=512)
    swp = raycast_sweep(jnp.asarray(tsdf), jnp.asarray(weights),
                        rel_r, rel_t, intr, voxel, trunc, H, W,
                        oversample=1.5, axis=ax)
    m_ref = np.asarray(ref["mask"])
    m_swp = np.asarray(swp["mask"])
    assert (m_ref == m_swp).mean() > 0.97
    both = m_ref & m_swp
    dt = np.abs(np.asarray(ref["raylengths"]) -
                np.asarray(swp["raylengths"]))[both]
    assert np.median(dt) < voxel
