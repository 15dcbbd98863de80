"""Multi-device sharding: the full frame step over an (obj, z) mesh.

BASELINE.json stress-config analogue at test scale: a filled 16-object
pool sharded over the 8 virtual CPU devices, one jitted track+integrate
step, verified against the unsharded result.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emfusion_tpu.config import Params
from emfusion_tpu.distributed.mesh import (make_mesh, shard_state,
                                           state_shardings)
from emfusion_tpu.pipeline import EMFusionPipeline
from synthetic import SyntheticScene


@pytest.fixture(scope="module")
def setup():
    scene = SyntheticScene(H=48, W=64, f=48.0)
    params = Params(
        frameSize=(scene.W, scene.H), fx=scene.f, fy=scene.f,
        cx=scene.W / 2 - 0.5, cy=scene.H / 2 - 0.5,
        globalVolumeDims=(32, 32, 32), globalVoxelSize=2.4 / 32,
        volumePose=(0.0, 0.0, 1.6), objVolumeDims=(16, 16, 16),
        maxTrackingIter=5, raycast_max_steps=96, max_objects=16,
        maskRCNNFrames=1000)
    pipe = EMFusionPipeline(params, None)
    depth, _ = scene.render(np.eye(4, dtype=np.float32),
                            np.array([0.1, 0.0, 1.2]))
    return pipe, depth


def _fill_pool(pipe, n=16):
    """Activate n object slots with small volumes around the scene."""
    o = pipe.state.objs
    K = pipe.K
    rng = np.random.RandomState(3)
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(n):
        poses[k, :3, 3] = [0.3 * rng.randn(), 0.3 * rng.randn(), 1.3]
    o = o.replace(
        active=jnp.asarray(np.arange(K) < n),
        visible=jnp.asarray(np.arange(K) < n),
        object_id=jnp.asarray(np.arange(1, K + 1, dtype=np.int32)),
        pose=jnp.asarray(poses),
        voxel_size=jnp.full((K,), 0.03),
        truncdist=jnp.full((K,), 0.3),
        assoc=jnp.full_like(o.assoc, 0.05),
    )
    pipe.state = pipe.state.replace(objs=o)


def test_sharded_frame_step_matches_unsharded(setup):
    pipe, depth = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _fill_pool(pipe, n=16)
    depth_j, points = pipe._preprocess(jnp.asarray(depth))
    state0 = pipe._integrate(pipe.state, depth_j)

    # unsharded reference
    state_ref, _, _, rc_ref = jax.jit(pipe._frame_track_fn)(state0, points)
    state_ref = pipe._integrate(state_ref, depth_j)

    # sharded over the (obj, z) mesh
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    state_sh = shard_state(state0, mesh)
    sh = state_shardings(mesh, state_sh)
    step = jax.jit(lambda s, pts: pipe._frame_track_fn(s, pts)[0],
                   in_shardings=(sh, None), out_shardings=sh)
    out = step(state_sh, points)
    out = pipe._integrate(out, depth_j)

    np.testing.assert_allclose(np.asarray(out.cam_pose),
                               np.asarray(state_ref.cam_pose), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.bg_tsdf),
                               np.asarray(state_ref.bg_tsdf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.objs.pose),
                               np.asarray(state_ref.objs.pose), atol=1e-4)
    # pool stays sharded over the object axis
    assert "obj" in str(out.objs.tsdf.sharding.spec)


def test_mesh_factorizations():
    for n, shape in ((1, (1, 1)), (2, (1, 2)), (4, (2, 2)), (8, (4, 2))):
        if len(jax.devices()) < n:
            pytest.skip("not enough devices")
        m = make_mesh(n)
        assert m.devices.shape == shape, (n, m.devices.shape)


def test_pixel_sharded_gn_tracking_matches():
    """Pixel-sharded Gauss-Newton (VERDICT r1 missing #2): tracking
    points sharded over a 1-D mesh; GSPMD turns the (6,N)x(N,6)
    normal-equation contraction into per-shard partial products + an
    all-reduce (the TPU analogue of reduceAb, src/core/TSDF.cpp:375-389).
    The LM result must match the replicated run exactly."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from emfusion_tpu.geometry import se3_exp
    from emfusion_tpu.tracking import TrackConfig, track_volume

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    res, voxel, trunc = 48, 0.05, 0.25
    idx = np.arange(res, dtype=np.float32) - (res - 1) / 2
    zz, yy, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    r = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) * voxel
    tsdf = np.clip((r - 0.5) / trunc, -1, 1).astype(np.float32)
    weights = np.ones_like(tsdf)

    rng = np.random.RandomState(7)
    n = 4096
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 2] = -np.abs(v[:, 2])
    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = -1.2
    T = np.linalg.inv(gt)
    pts = ((v * 0.5) @ T[:3, :3].T + T[:3, 3]).astype(np.float32).T
    init = np.asarray(se3_exp(jnp.array(
        [0.02, -0.03, 0.04, 0.02, -0.01, 0.015]))) @ gt
    assoc = np.ones(n, np.float32)
    cfg = TrackConfig(max_iter=30)

    f = jax.jit(lambda t, w, p_, a, ini: track_volume(
        t, w, voxel, p_, a, ini, cfg)[0])
    pose_ref = np.asarray(f(jnp.asarray(tsdf), jnp.asarray(weights),
                            jnp.asarray(pts), jnp.asarray(assoc),
                            jnp.asarray(init)))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("px",))
    pts_sh = jax.device_put(pts, NamedSharding(mesh, P(None, "px")))
    asc_sh = jax.device_put(assoc, NamedSharding(mesh, P("px")))
    pose_sh = np.asarray(f(jnp.asarray(tsdf), jnp.asarray(weights),
                           pts_sh, asc_sh, jnp.asarray(init)))
    np.testing.assert_allclose(pose_sh, pose_ref, atol=1e-5)

    # the compiled sharded program must actually reduce across shards
    lowered = f.lower(jnp.asarray(tsdf), jnp.asarray(weights), pts_sh,
                      asc_sh, jnp.asarray(init))
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo or "all_reduce" in hlo
