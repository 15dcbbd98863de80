import numpy as np
import jax.numpy as jnp

from emfusion_tpu.ops.fusion import compute_gradients
from emfusion_tpu.ops.raycast import raycast_volume


def sphere_volume(res=64, voxel=0.05, radius=0.5, trunc=0.25):
    """Analytic sphere TSDF centered at the volume center."""
    idx = np.arange(res, dtype=np.float32) - (res - 1) / 2.0
    zz, yy, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    dist = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) * voxel
    sdf = dist - radius
    tsdf = np.clip(sdf / trunc, -1.0, 1.0).astype(np.float32)
    weights = np.ones_like(tsdf)
    return tsdf, weights


def make_intr(H, W, f=80.0):
    return jnp.array([[f, 0, W / 2 - 0.5], [0, f, H / 2 - 0.5], [0, 0, 1]],
                     dtype=jnp.float32)


def test_raycast_sphere_center_ray():
    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))
    H, W = 48, 64
    intr = make_intr(H, W)
    # camera 1.5m in front of volume center along -z (volume frame)
    rel_t = jnp.array([0.0, 0.0, -1.5])
    out = raycast_volume(jnp.asarray(tsdf), grads, jnp.asarray(weights),
                         jnp.eye(3), rel_t, intr, voxel, trunc, H, W,
                         max_steps=512)
    ray = np.asarray(out["raylengths"])
    mask = np.asarray(out["mask"])
    cy, cx = H // 2, W // 2
    assert mask[cy, cx]
    # center ray hits the sphere at depth 1.5 - 0.5 = 1.0
    np.testing.assert_allclose(ray[cy, cx], 1.0, atol=voxel)
    # vertex in camera coords near (0, 0, 1)
    v = np.asarray(out["vertices"])[:, cy, cx]
    np.testing.assert_allclose(v, [0.0, 0.0, 1.0], atol=2 * voxel)
    # normal points back toward the camera (-z dominant)
    n = np.asarray(out["normals"])[:, cy, cx]
    assert n[2] < -0.9


def test_raycast_sphere_profile():
    """Hit depths across the image match the analytic ray-sphere
    intersection."""
    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))
    H, W = 48, 64
    f = 80.0
    intr = make_intr(H, W, f)
    cam_z = -1.5
    rel_t = jnp.array([0.0, 0.0, cam_z])
    out = raycast_volume(jnp.asarray(tsdf), grads, jnp.asarray(weights),
                         jnp.eye(3), rel_t, intr, voxel, trunc, H, W,
                         max_steps=512)
    ray = np.asarray(out["raylengths"])
    mask = np.asarray(out["mask"])
    cy, cx = H // 2, W // 2
    checked = 0
    for dx in range(-8, 9, 4):
        px = cx + dx
        u = (px - (W / 2 - 0.5)) / f
        d = np.array([u, 0.0, 1.0])
        d = d / np.linalg.norm(d)
        o = np.array([0.0, 0.0, cam_z])
        b = 2 * d @ o
        c = o @ o - radius ** 2
        disc = b * b - 4 * c
        if disc <= 0:
            continue
        t_hit = (-b - np.sqrt(disc)) / 2
        assert mask[cy, px], f"expected hit at {px}"
        np.testing.assert_allclose(ray[cy, px], t_hit, atol=1.5 * voxel)
        checked += 1
    assert checked >= 4
    # rays missing the sphere produce no hit (corner)
    assert not mask[0, 0]


def test_raycast_zero_weight_no_hit():
    res, voxel, radius, trunc = 32, 0.1, 0.5, 0.5
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))
    H, W = 24, 32
    intr = make_intr(H, W, 40.0)
    out = raycast_volume(jnp.asarray(tsdf), grads,
                         jnp.zeros_like(jnp.asarray(weights)),
                         jnp.eye(3), jnp.array([0.0, 0.0, -1.2]), intr,
                         voxel, trunc, H, W, max_steps=256)
    assert not np.asarray(out["mask"]).any()


def test_raycast_prev_raylength_clamp():
    """A nearer previous hit stops the march (composite rule)."""
    res, voxel, radius, trunc = 64, 0.05, 0.5, 0.25
    tsdf, weights = sphere_volume(res, voxel, radius, trunc)
    grads = compute_gradients(jnp.asarray(tsdf))
    H, W = 16, 16
    intr = make_intr(H, W, 20.0)
    prev = jnp.full((H, W), 0.5)  # closer than the sphere at t=1.0
    out = raycast_volume(jnp.asarray(tsdf), grads, jnp.asarray(weights),
                         jnp.eye(3), jnp.array([0.0, 0.0, -1.5]), intr,
                         voxel, trunc, H, W, max_steps=512,
                         prev_raylengths=prev)
    assert not np.asarray(out["mask"]).any()
