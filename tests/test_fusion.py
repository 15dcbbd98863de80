import numpy as np
import jax.numpy as jnp

from emfusion_tpu.ops.fusion import (
    integrate_tsdf, compute_gradients, integrate_fg_mask,
)


def numpy_update_tsdf(tsdf, weights, depth, assoc, rot, trans, intr,
                      voxel_size, truncdist, max_weight):
    """Literal NumPy port of kernel_updateTSDF semantics (TSDF.cu:327-401)
    used as a test oracle."""
    Z, Y, X = tsdf.shape
    H, W = depth.shape
    out_t = tsdf.copy()
    out_w = weights.copy()
    fx, fy, cx, cy = intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2]
    for z in range(Z):
        for y in range(Y):
            for x in range(X):
                pos = np.array([(x - (X - 1) / 2) * voxel_size,
                                (y - (Y - 1) / 2) * voxel_size,
                                (z - (Z - 1) / 2) * voxel_size])
                pc = rot @ pos + trans
                if pc[2] <= 0:
                    if out_w[z, y, x] == 0:
                        out_t[z, y, x] = 0
                    continue
                px = int(np.round(pc[0] * fx / pc[2] + cx))
                py = int(np.round(pc[1] * fy / pc[2] + cy))
                if px < 0 or px >= W or py < 0 or py >= H:
                    continue
                d = depth[py, px]
                if d <= 0:
                    if out_w[z, y, x] == 0:
                        out_t[z, y, x] = 0
                    continue
                lam = np.linalg.norm([(px - cx) / fx, (py - cy) / fy, 1.0])
                sdf = d - np.linalg.norm(pc) / lam
                pw = out_w[z, y, x]
                if sdf >= -truncdist:
                    tv = np.sign(sdf) * min(1.0, abs(sdf) / truncdist)
                    aw = assoc[py, px] if sdf < truncdist else 1.0
                    if pw + aw > 0:
                        out_t[z, y, x] = (pw * tsdf[z, y, x] + aw * tv) / (
                            pw + aw)
                        out_w[z, y, x] = min(pw + aw, max_weight)
                elif pw == 0:
                    out_t[z, y, x] = -1
    return out_t, out_w


def make_plane_depth(H, W, z=1.0):
    return np.full((H, W), z, np.float32)


def test_integrate_matches_numpy_oracle(rng):
    Z = Y = X = 12
    H, W = 24, 32
    intr = np.array([[30.0, 0, W / 2 - 0.5], [0, 30.0, H / 2 - 0.5],
                     [0, 0, 1]], np.float32)
    voxel = 0.05
    trunc = 0.15
    depth = make_plane_depth(H, W, 0.8)
    depth[5:8, 5:8] = 0.0  # invalid patch
    assoc = rng.rand(H, W).astype(np.float32)
    tsdf0 = rng.randn(Z, Y, X).astype(np.float32) * 0.1
    w0 = (rng.rand(Z, Y, X) < 0.5).astype(np.float32) * 2.0
    # Generic (non-axis-aligned) pose so float32-vs-float64 pixel-rounding
    # ties cannot occur; the jnp kernel computes in f32, the oracle in f64.
    th = 0.03
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0],
                    [0, 0, 1]], np.float32)
    trans = np.array([0.0137, -0.0211, 0.7129], np.float32)

    expect_t, expect_w = numpy_update_tsdf(
        tsdf0, w0, depth, assoc, rot, trans, intr, voxel, trunc, 64.0)

    got_t, got_w = integrate_tsdf(
        jnp.asarray(tsdf0), jnp.asarray(w0), jnp.asarray(depth),
        jnp.asarray(assoc), jnp.asarray(rot), jnp.asarray(trans),
        jnp.asarray(intr), voxel, trunc, 64.0)

    np.testing.assert_allclose(np.asarray(got_t), expect_t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_w), expect_w, atol=1e-5)


def test_integrate_plane_surface():
    """Fusing a frontal plane yields a zero-crossing at the plane depth."""
    Z = Y = X = 32
    H, W = 64, 64
    intr = np.array([[60.0, 0, 31.5], [0, 60.0, 31.5], [0, 0, 1]], np.float32)
    voxel = 0.05
    trunc = 0.25
    depth = make_plane_depth(H, W, 1.0)
    assoc = np.ones((H, W), np.float32)
    tsdf = jnp.zeros((Z, Y, X))
    w = jnp.zeros((Z, Y, X))
    # volume centered 1.0m in front of camera
    trans = np.array([0.0, 0.0, 1.0], np.float32)
    t, wt = integrate_tsdf(tsdf, w, jnp.asarray(depth), jnp.asarray(assoc),
                           jnp.eye(3), jnp.asarray(trans), jnp.asarray(intr),
                           voxel, trunc, 64.0)
    t = np.asarray(t)
    # central column along z: in front of plane positive, behind negative
    center = (X - 1) // 2
    col = t[:, center, center]
    # z index 15/16 straddles the plane (volume center at plane)
    assert col[10] > 0.5       # in front (closer to camera)
    assert col[22] < 0.0       # behind
    # crossing near center
    signs = np.sign(col[8:24])
    assert (signs[:-1] != signs[1:]).any()


def test_compute_gradients_matches_diff(rng):
    vol = rng.randn(6, 7, 8).astype(np.float32)
    g = np.asarray(compute_gradients(jnp.asarray(vol)))   # (3, Z, Y, X)
    np.testing.assert_allclose(g[0, 2, 3, 4], vol[2, 3, 5] - vol[2, 3, 4],
                               atol=1e-6)
    np.testing.assert_allclose(g[1, 2, 3, 4], vol[2, 4, 4] - vol[2, 3, 4],
                               atol=1e-6)
    np.testing.assert_allclose(g[2, 2, 3, 4], vol[3, 3, 4] - vol[2, 3, 4],
                               atol=1e-6)
    # boundary slabs zero
    assert (g[:, -1] == 0).all() and (g[:, :, -1] == 0).all() \
        and (g[:, :, :, -1] == 0).all()


def test_integrate_fg_mask(rng):
    Z = Y = X = 8
    H, W = 16, 16
    intr = np.array([[20.0, 0, 7.5], [0, 20.0, 7.5], [0, 0, 1]], np.float32)
    voxel = 0.1
    tsdf = np.zeros((Z, Y, X), np.float32)  # all |tsdf| < 1
    weights = np.ones((Z, Y, X), np.float32)
    fg = np.zeros((2, Z, Y, X), np.float32)
    mask = np.zeros((H, W), bool)
    mask[:, :8] = True  # left half foreground
    occ = np.zeros((H, W), bool)
    trans = np.array([0.0, 0.0, 1.0], np.float32)

    out = np.asarray(integrate_fg_mask(
        jnp.asarray(tsdf), jnp.asarray(weights), jnp.asarray(fg),
        jnp.asarray(mask), jnp.asarray(occ), jnp.eye(3), jnp.asarray(trans),
        jnp.asarray(intr), voxel))
    # left-of-center voxels (negative x) project onto mask -> fg count
    assert out[0, 4, 4, 1] == 1.0 and out[1, 4, 4, 1] == 0.0
    assert out[0, 4, 4, 6] == 0.0 and out[1, 4, 4, 6] == 1.0

    # occluded pixels do not update
    occ[:, :] = True
    out2 = np.asarray(integrate_fg_mask(
        jnp.asarray(tsdf), jnp.asarray(weights), jnp.asarray(fg),
        jnp.asarray(mask), jnp.asarray(occ), jnp.eye(3), jnp.asarray(trans),
        jnp.asarray(intr), voxel))
    assert (out2 == 0).all()

    # unseen voxels (weight 0) do not update
    out3 = np.asarray(integrate_fg_mask(
        jnp.asarray(tsdf), jnp.zeros((Z, Y, X)), jnp.asarray(fg),
        jnp.asarray(mask), jnp.asarray(np.zeros((H, W), bool)), jnp.eye(3),
        jnp.asarray(trans), jnp.asarray(intr), voxel))
    assert (out3 == 0).all()


def test_carve_dist_erodes_stale_surface():
    """bg_carve_dist semantics: free-space evidence at sdf >= carve_dist
    integrates at weight 1.0 regardless of the association weight, so a
    stale surface contradicted by depth erodes even where the bg
    association is ~0 (departing-object imprint); carve_dist=None keeps
    exact reference behavior (stale shell frozen under tiny assoc)."""
    from tests.test_fusion import make_plane_depth  # self-import safe
    Z = Y = X = 32
    H, W = 64, 64
    intr = np.array([[60.0, 0, 31.5], [0, 60.0, 31.5], [0, 0, 1]],
                    np.float32)
    voxel = 0.05
    trunc = 0.5          # wide band, like 128^3 @ 4 cm voxels
    trans = np.array([0.0, 0.0, 1.0], np.float32)
    args = (jnp.eye(3), jnp.asarray(trans), jnp.asarray(intr), voxel,
            trunc)

    # burn a plane at 1.0 m with weight 1 (the frame-0 assoc=1 imprint)
    d0 = make_plane_depth(H, W, 1.0)
    assoc1 = np.ones((H, W), np.float32)
    t0, w0 = integrate_tsdf(jnp.zeros((Z, Y, X)), jnp.zeros((Z, Y, X)),
                            jnp.asarray(d0), jnp.asarray(assoc1), *args,
                            64.0)

    # the surface moves back 10 cm; bg association collapses to ~0
    d1 = make_plane_depth(H, W, 1.10)
    assoc0 = np.full((H, W), 1e-3, np.float32)
    c = (X - 1) // 2

    shell = np.asarray(t0)[:, c, c]
    zpos_all = (np.arange(Z) - (Z - 1) / 2) * voxel + 1.0
    # the stale shell: weighted voxels near the OLD crossing, in front
    # of the new surface
    # (exclude z <= 0.6 where the reference's own beyond-trunc weight-1
    # rule already applies: sdf_new = 1.1 - z >= trunc there)
    stale_band = (np.abs(shell) < 0.9) & (zpos_all < 1.10 - 0.02) \
        & (zpos_all > 0.62) & (np.asarray(w0)[:, c, c] > 0.5)
    assert stale_band.sum() >= 5

    # reference semantics: shell frozen (update weight ~1e-3)
    t_ref, _ = integrate_tsdf(t0, w0, jnp.asarray(d1),
                              jnp.asarray(assoc0), *args, 64.0)
    ref_col = np.asarray(t_ref)[:, c, c]
    np.testing.assert_allclose(ref_col[stale_band], shell[stale_band],
                               atol=5e-3)

    # carve_dist=0.05: voxels with sdf >= 5 cm (the old surface now has
    # sdf ~ +10 cm) get weight-1 free-space updates and erode fast
    t_c, _ = integrate_tsdf(t0, w0, jnp.asarray(d1),
                            jnp.asarray(assoc0), *args, 64.0,
                            carve_dist=0.05)
    t_c2, _ = integrate_tsdf(t_c, _, jnp.asarray(d1),
                             jnp.asarray(assoc0), *args, 64.0,
                             carve_dist=0.05)
    carved = np.asarray(t_c2)[:, c, c]
    # the old crossing must be gone wherever sdf >= carve_dist: any
    # surviving negative sits within carve_dist (5 cm) of the TRUE
    # surface — below the compositor's bg-override threshold, so it can
    # no longer blank an object's segmentation
    carve_zone = stale_band & (zpos_all < 1.10 - 0.05 - voxel / 2)
    assert carve_zone.sum() >= 5
    assert (carved[carve_zone] > 0.0).all(), carved[carve_zone]
    # weighted voxels behind the new surface untouched at weight 1
    behind = (zpos_all > 1.10 + 0.06) & (np.asarray(w0)[:, c, c] > 0.5)
    np.testing.assert_allclose(carved[behind], shell[behind], atol=5e-3)


def test_carve_dist_parity_across_backends():
    """carve_dist must behave identically in the gather and pencil
    formulations (the Pallas kernel shares the pencil's glob row and is
    parity-tested on TPU)."""
    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil
    Z = Y = X = 32
    H, W = 64, 64
    intr = np.array([[60.0, 0, 31.5], [0, 60.0, 31.5], [0, 0, 1]],
                    np.float32)
    voxel = 0.05
    trunc = 0.5
    trans = np.array([0.0, 0.0, 1.0], np.float32)
    d0 = make_plane_depth(H, W, 1.0)
    t0, w0 = integrate_tsdf(jnp.zeros((Z, Y, X)), jnp.zeros((Z, Y, X)),
                            jnp.asarray(d0),
                            jnp.ones((H, W), jnp.float32),
                            jnp.eye(3), jnp.asarray(trans),
                            jnp.asarray(intr), voxel, trunc, 64.0)
    d1 = make_plane_depth(H, W, 1.10)
    assoc0 = np.full((H, W), 1e-3, np.float32)
    tg, wg = integrate_tsdf(t0, w0, jnp.asarray(d1), jnp.asarray(assoc0),
                            jnp.eye(3), jnp.asarray(trans),
                            jnp.asarray(intr), voxel, trunc, 64.0,
                            carve_dist=0.05)
    tp, wp = integrate_tsdf_pencil(t0, w0, jnp.asarray(d1),
                                   jnp.asarray(assoc0), jnp.eye(3),
                                   jnp.asarray(trans), jnp.asarray(intr),
                                   voxel, trunc, 64.0, carve_dist=0.05)
    # pencil warps depth/assoc through nearest-pixel B-grid sampling:
    # small boundary-pixel deviations are expected (same class the main
    # backend-parity tests carry); the carve semantics must agree
    np.testing.assert_allclose(np.asarray(tg), np.asarray(tp), atol=2e-2)
    np.testing.assert_allclose(np.asarray(wg), np.asarray(wp), atol=2e-2)
    # and the stale shell must actually have been carved on BOTH paths
    c = 15
    assert (np.asarray(tg)[10:14, c, c] > 0.1).all()
    assert (np.asarray(tp)[10:14, c, c] > 0.1).all()
