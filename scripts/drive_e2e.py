"""End-to-end drive: mini KinectFusion loop through the public API.
Scene: two spheres + floor plane (fully constrains all 6 DoF)."""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp

from emfusion_tpu.geometry import backproject_depth, preprocess_depth, se3_exp, pose_inverse, reorthonormalize
from emfusion_tpu.ops import integrate_tsdf, compute_gradients, raycast_volume, render_phong
from emfusion_tpu.ops.render import make_colormap
from emfusion_tpu.tracking import TrackConfig, track_volume

H, W = 120, 160
F = 120.0
intr = jnp.array([[F,0,W/2-0.5],[0,F,H/2-0.5],[0,0,1]], jnp.float32)
SPHERES = [(np.array([ -0.15, 0.0, 1.2]), 0.25), (np.array([0.25, -0.1, 1.35]), 0.18)]
FLOOR_Y = 0.32

def render_depth(cam_pose_w):
    Tinv = np.asarray(pose_inverse(jnp.asarray(cam_pose_w)))
    ys, xs = np.mgrid[0:H, 0:W]
    d = np.stack([(xs-(W/2-0.5))/F, (ys-(H/2-0.5))/F, np.ones_like(xs,np.float32)], -1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = Tinv[:3,3]
    dw = d  # rays in cam frame; transform scene into cam frame instead
    t_best = np.full((H,W), np.inf)
    for c_w, r in SPHERES:
        c = Tinv[:3,:3] @ c_w + Tinv[:3,3] - 0*o
        b = -2*(dw @ c); cc = c@c - r**2
        disc = b*b - 4*cc
        t = np.where(disc>0, (-b-np.sqrt(np.maximum(disc,0)))/2, np.inf)
        t_best = np.minimum(t_best, np.where(t>0, t, np.inf))
    # floor plane y = FLOOR_Y in world: n_w=(0,1,0), point p0=(0,FLOOR_Y,0)
    n_c = Tinv[:3,:3] @ np.array([0,1.0,0]); p0_c = Tinv[:3,:3] @ np.array([0,FLOOR_Y,0]) + Tinv[:3,3]
    denom = dw @ n_c
    t_pl = np.where(np.abs(denom)>1e-6, (p0_c @ n_c)/np.where(np.abs(denom)>1e-6,denom,1), np.inf)
    t_best = np.minimum(t_best, np.where(t_pl>0, t_pl, np.inf))
    depth = np.where(np.isfinite(t_best), t_best*dw[...,2], 0.0).astype(np.float32)
    depth[depth>3.0] = 0.0
    return depth

res, voxel = 96, 0.015
trunc = 10*voxel
vol_pose = np.eye(4, dtype=np.float32); vol_pose[2,3] = 1.2

cam0 = np.eye(4, dtype=np.float32)
depth0 = render_depth(cam0)
print("frame0 depth: valid px =", (depth0>0).sum())

depth0_f = preprocess_depth(jnp.asarray(depth0))
tsdf = jnp.zeros((res,res,res)); wts = jnp.zeros((res,res,res))
rel_oc = np.asarray(pose_inverse(jnp.asarray(cam0))) @ vol_pose
tsdf, wts = integrate_tsdf(tsdf, wts, depth0_f, jnp.ones((H,W)), jnp.asarray(rel_oc[:3,:3]), jnp.asarray(rel_oc[:3,3]), intr, voxel, trunc, 64.0)
grads = compute_gradients(tsdf)
print("fused: nonzero weights =", int((np.asarray(wts)>0).sum()))

rel_co = np.linalg.inv(vol_pose) @ cam0
out = raycast_volume(tsdf, grads, wts, jnp.asarray(rel_co[:3,:3].astype(np.float32)), jnp.asarray(rel_co[:3,3].astype(np.float32)), intr, voxel, trunc, H, W, max_steps=512)
m = np.asarray(out["mask"]); rl = np.asarray(out["raylengths"])
d_rc = rl[H//2,W//2]
print("raycast: hits = %d, center depth = %.4f (analytic %.4f)" % (m.sum(), d_rc, depth0[H//2,W//2]))

img = np.asarray(render_phong(out["vertices"], out["normals"], jnp.zeros((H,W),jnp.int32), jnp.asarray(make_colormap())))
print("render: lit px =", (img.sum(-1)>0).sum())
import imageio; imageio.imwrite("/tmp/e2e_render.png", img)

xi_gt = np.array([0.015,-0.02,0.01, 0.02,0.01,-0.015], np.float32)
cam1 = np.asarray(se3_exp(jnp.asarray(xi_gt))) @ cam0
depth1 = render_depth(cam1)
pts1 = backproject_depth(preprocess_depth(jnp.asarray(depth1)), intr).reshape(3,-1)

rel_init = reorthonormalize(jnp.asarray(np.linalg.inv(vol_pose) @ cam0))
pose_est, stats = track_volume(tsdf, wts, voxel, pts1, jnp.ones(pts1.shape[1]), rel_init, TrackConfig(max_iter=60))
cam1_est = vol_pose @ np.asarray(pose_est)
err_t = np.linalg.norm(cam1_est[:3,3]-cam1[:3,3]); err_R = np.linalg.norm(cam1_est[:3,:3]-cam1[:3,:3])
print("tracking: iters =", int(stats['iterations']), "converged =", bool(stats['converged']))
print("pose error: |dt| = %.5f m  |dR|_F = %.5f  (init |dt| = %.5f)" % (err_t, err_R, np.linalg.norm(cam0[:3,3]-cam1[:3,3])))
assert err_t < 0.0075 and err_R < 0.02, "tracking failed"  # half-voxel: single-view fused map
print("E2E DRIVE OK")

# --- multi-frame loop: track then fuse each frame, error should stay bounded
print("\n-- multi-frame SLAM loop --")
cam_est = cam0.copy()
tsdf2 = tsdf; wts2 = wts; grads2 = grads
errs = []
for k in range(1, 6):
    xi = np.array([0.01*k, -0.012*k, 0.008*k, 0.012*k, 0.006*k, -0.01*k], np.float32) * 0.6
    cam_gt = np.asarray(se3_exp(jnp.asarray(xi)))
    depth_k = preprocess_depth(jnp.asarray(render_depth(cam_gt)))
    pts = backproject_depth(depth_k, intr).reshape(3,-1)
    rel_init = reorthonormalize(jnp.asarray(np.linalg.inv(vol_pose) @ cam_est))
    pose_rel, st = track_volume(tsdf2, wts2, voxel, pts, jnp.ones(pts.shape[1]), rel_init, TrackConfig(max_iter=60))
    cam_est = vol_pose @ np.asarray(pose_rel)
    rel_oc = np.linalg.inv(cam_est) @ vol_pose
    tsdf2, wts2 = integrate_tsdf(tsdf2, wts2, depth_k, jnp.ones((H,W)), jnp.asarray(rel_oc[:3,:3].astype(np.float32)), jnp.asarray(rel_oc[:3,3].astype(np.float32)), intr, voxel, trunc, 64.0)
    grads2 = compute_gradients(tsdf2)
    e = np.linalg.norm(cam_est[:3,3]-cam_gt[:3,3])
    errs.append(e)
    print("frame %d: |dt| err = %.5f m, iters=%d" % (k, e, int(st['iterations'])))
assert max(errs) < 0.01, "drift too large"
print("E2E MULTI-FRAME OK, max err %.5f m (%.2f voxels)" % (max(errs), max(errs)/voxel))
