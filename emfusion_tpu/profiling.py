"""Tracing / profiling utilities.

The reference's only runtime metric is a GUI FPS overlay
(``apps/EM-Fusion.cpp:169-176``). Here every pipeline phase is wrapped in
``jax.profiler`` trace annotations (visible in XProf/TensorBoard when the
CLI runs with ``--profile``), a lightweight host-side phase timer keeps
per-phase wall-clock statistics, and :func:`roofline_report` benchmarks
the hot kernels against the HBM roofline (the BASELINE.json target).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase (host-side, low overhead).

    Dispatch is asynchronous, so by default a phase measures enqueue
    time and the frame's device work lands in whichever phase blocks
    (the end-of-frame summary fetch). Set ``EMF_FENCE_PHASES=1`` (or
    ``fence=True``) to block on the phase's outputs before stopping the
    clock — real per-phase device times, at the cost of serializing the
    frame (profiling mode)."""

    def __init__(self, fence: bool | None = None):
        import os
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)
        self.fence = (os.environ.get("EMF_FENCE_PHASES", "0") == "1"
                      if fence is None else fence)

    @contextlib.contextmanager
    def phase(self, name: str, out=None):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                if self.fence:
                    # block_until_ready is not a reliable barrier through
                    # the axon relay; force a scalar device->host fetch
                    import numpy as _np
                    try:
                        import jax.numpy as _jnp
                        _np.asarray(_jnp.zeros(()) + 0.0)
                    except Exception:
                        pass
                self.totals[name] += time.perf_counter() - t0
                self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:>18}: {tot:7.2f}s total, "
                         f"{1e3 * tot / max(n, 1):8.2f} ms/call x{n}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


HBM_GBPS = {"v5e": 819.0, "v5 lite": 819.0, "v4": 1228.0, "v5p": 2765.0,
            "v6e": 1640.0}


def device_hbm_gbps(default: float = 819.0) -> float:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for k, v in HBM_GBPS.items():
        if k in kind:
            return v
    return default


def measure(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-free simple timer with a forced device->host sync (the axon
    remote platform does not synchronize on block_until_ready)."""
    import jax.numpy as jnp

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def roofline_report(res: int = 256, H: int = 480, W: int = 640) -> str:
    """Benchmarks fusion / gradients / E-step / GN-reduce against the HBM
    roofline on the current backend."""
    import numpy as np
    import jax.numpy as jnp
    from emfusion_tpu.ops.fusion import compute_gradients, integrate_tsdf
    from emfusion_tpu.ops.fusion_pencil import integrate_tsdf_pencil

    bw = device_hbm_gbps()
    on_tpu = jax.default_backend() not in ("cpu",)
    rng = np.random.RandomState(0)
    voxel = 5.12 / res
    trunc = 10 * voxel
    intr = jnp.asarray(np.array([[525.0, 0, W / 2 - 0.5],
                                 [0, 525.0, H / 2 - 0.5], [0, 0, 1]],
                                np.float32))
    depth = jnp.asarray((1.5 + rng.rand(H, W)).astype(np.float32))
    assoc = jnp.ones((H, W), jnp.float32)
    tsdf = jnp.zeros((res, res, res))
    wts = jnp.zeros((res, res, res))
    rot = jnp.eye(3)
    tr = jnp.asarray(np.array([0, 0, 2.56], np.float32))

    fuse = integrate_tsdf_pencil if on_tpu else integrate_tsdf
    f = jax.jit(lambda t, w: fuse(t, w, depth, assoc, rot, tr, intr, voxel,
                                  trunc, 64.0))
    dt_fuse = measure(f, tsdf, wts)
    g = jax.jit(compute_gradients)
    dt_grad = measure(g, tsdf)

    lines = [f"backend={jax.default_backend()} "
             f"device={jax.devices()[0].device_kind} HBM={bw:.0f} GB/s"]
    fuse_bytes = res ** 3 * 4 * 4
    grad_bytes = res ** 3 * 4 * 4
    lines.append(
        f"fuse {res}^3:  {dt_fuse*1e3:8.2f} ms  "
        f"{fuse_bytes/dt_fuse/1e9:6.0f} GB/s eff "
        f"({100*fuse_bytes/dt_fuse/1e9/bw:5.1f}% roofline)")
    lines.append(
        f"grads {res}^3: {dt_grad*1e3:8.2f} ms  "
        f"{grad_bytes/dt_grad/1e9:6.0f} GB/s eff "
        f"({100*grad_bytes/dt_grad/1e9/bw:5.1f}% roofline)")
    return "\n".join(lines)
