"""Direct SDF-gradient Levenberg-Marquardt pose tracking, device-resident.

TPU-native redesign of the reference tracking state machine
(``src/core/TSDF.cpp:170-344`` + ``EMFusion::performTracking``,
``src/core/EMFusion.cpp:672-724``). The reference runs up to 100 LM
iterations with a GPU->CPU download *per iteration* (``reduceHessians``,
``TSDF.cpp:274-282``) and solves the 6x6 system on the host with Sophus.
Here the whole loop — residual sampling, Jacobian assembly, Huber/
integration/association weight combination, the 6x6 normal equations
(one (6,N)x(N,6) matmul instead of per-pixel 36-element outer products +
column reduce), the LM accept/reject damping logic and the SE(3) update —
runs inside a single ``lax.while_loop`` with on-device convergence flags.
Batched over the object pool with ``vmap`` (the analogue of the reference's
per-object CUDA streams with stage interleaving).

LM semantics preserved exactly:
  * ``mu = tau * max(diag(A))`` on the first iteration (``TSDF.cpp:289-294``)
  * gradient-convergence ``max|b| < eps1`` (``:279-282``)
  * step-convergence ``|x| < eps2 (|log(rel_pose)| + eps2)`` (``:297-301``)
  * gain ratio ``rho = (err - err_new) / (0.5 x^T (mu x + b))`` with
    ``mu *= max(1/3, 1-(2 rho-1)^3)`` on accept, ``mu *= nu; nu *= nu_init``
    and gradient reuse (``evaluateGradient=false``) on reject (``:318-335``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from emfusion_tpu.geometry.capture import (
    WIN, capture_neighborhoods, capture_neighborhoods_batched, drift_ok,
    out_of_window_count, sample_system_from_cache,
    sample_value_from_cache,
)
from emfusion_tpu.geometry.sampling import (
    sample_system_at_points, sample_volume_at_points,
)
from emfusion_tpu.geometry.se3 import se3_exp, se3_log


@dataclasses.dataclass(frozen=True)
class TrackConfig:
    """Static LM parameters (reference ``TSDFParams``, ``data.h:32-71``).

    ``sampler``: "gather" re-samples the volumes from HBM every LM
    iteration (the direct analogue of the reference kernels); "capture"
    gathers each point's 6^3 neighborhood once and evaluates iterations
    algebraically from the cache (see ``geometry.capture``), re-capturing
    only when the pose drifts out of the cached windows — the TPU
    production path (XLA gathers are the LM bottleneck). "auto" picks
    capture on accelerators, gather on CPU."""
    tau: float = 1e3
    eps1: float = 1e-8
    eps2: float = 1e-8
    nu_init: float = 2.0
    huber_thresh: float = 0.2
    max_tsdf_weight: float = 64.0
    max_iter: int = 100
    # Re-capture budget per track call: a capture costs a streaming
    # volume pass (band) or a large gather; beyond the budget drifted
    # points drop out of the system via the samplers' window masks
    # instead of forcing another capture. Frame-scale motion is ~1-2
    # voxels, so a converging LM rarely needs more than 2.
    max_recaptures: int = 3
    sampler: str = "auto"
    # Capture backend: "gather" = per-point HBM neighborhood gather
    # (geometry.capture, exact voxel reads; ~140 ms/capture at 512^3
    # on v5e); "band" = banded sweep-capture (geometry.band_capture,
    # one streaming volume pass, in-plane-resampled values; Pallas
    # kernels on TPU, XLA reference elsewhere). "auto": band on TPU
    # when the caller provides band_args, gather otherwise.
    capture_backend: str = "auto"
    # Exact-refinement pass (r5, VERDICT r4 next #3): after the banded
    # LM converges, gather-capture the top-``refine_points`` combined-
    # weight points at the converged pose (exact voxel reads — small
    # subset, so the scalar-gather cost is a few ms) and run up to
    # ``refine_iters`` further LM iterations from the fixed exact
    # cache. The band's in-plane resample deviates O(1) at carve/clip
    # discontinuities of real fused volumes; driving the FINAL pose
    # with exact values pulls the production trajectory back toward
    # the exact path (accuracy gates: tests/test_accuracy_gate.py).
    # 0 disables.
    refine_points: int = 0
    refine_iters: int = 8


class _LMState(NamedTuple):
    R: jnp.ndarray          # (3,3) rel_pose_CO rotation
    t: jnp.ndarray          # (3,)  rel_pose_CO translation
    mu: jnp.ndarray
    nu: jnp.ndarray
    first: jnp.ndarray      # bool
    eval_grad: jnp.ndarray  # bool
    converged: jnp.ndarray  # bool
    J: jnp.ndarray          # (6, N)
    w: jnp.ndarray          # (N,)
    A: jnp.ndarray          # (6,6)
    b: jnp.ndarray          # (6,)
    err: jnp.ndarray        # sum(w * psi^2) at the current pose
    hub: jnp.ndarray        # (N,) huber weights at the last gradient eval
    it: jnp.ndarray
    cache: jnp.ndarray      # (2, W, W, W, N) captured tsdf+weight windows
    anchor: jnp.ndarray     # (3, N) capture anchors
    recaps: jnp.ndarray     # int32 re-capture count (profiling)


def _sample_tsdf(tsdf, points, R, t, voxel_size):
    return sample_volume_at_points(tsdf, points, R, t, voxel_size, margin=1)


def _pose_mat(R, t):
    top = jnp.concatenate([R, t[:, None]], axis=1)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype)], axis=0)


def track_volume(tsdf: jnp.ndarray, weights: jnp.ndarray,
                 voxel_size, points: jnp.ndarray, assoc: jnp.ndarray,
                 rel_pose_co: jnp.ndarray, cfg: TrackConfig,
                 active=True, band_args=None):
    """Run the LM loop for one volume.

    Args:
      tsdf/weights: (Z, Y, X).
      points: component-first (3, N) camera-space points (invalid ones
        have z <= 0). The SDF gradient is sampled as differences of
        shifted TSDF trilerps (exactly trilerp(forward-diff-volume) away
        from the outer boundary band) — no gradient volume needed.
      assoc: (N,) association weights for this model.
      rel_pose_co: (4, 4) initial camera-to-object transform (caller should
        have re-orthonormalized it, see ``geometry.se3.reorthonormalize``).
      active: scalar bool — False short-circuits (used by vmapped pool).
      band_args: optional (intr, h, w, SB, LB, axes, backend) enabling
        the banded sweep-capture (``geometry.band_capture``): ``intr``
        = intrinsics OF THE TRACKING PIXEL GRID (h, w) the points were
        built on (raster order required), SB/LB the static B-grid dims,
        ``axes`` the static scan-axis priority tuple (camera-dominant
        first; every axis is swept and each point takes the first that
        serves it), ``backend`` "xla"|"pallas".

    Returns (rel_pose_co_final (4,4), stats dict).
    """
    N = points.shape[1]
    f32 = jnp.float32
    use_capture = cfg.sampler == "capture" or (
        cfg.sampler == "auto"
        and jax.default_backend() not in ("cpu",))
    use_band = use_capture and band_args is not None and \
        cfg.capture_backend in ("auto", "band")
    shape = tsdf.shape
    if use_capture:
        vols = jnp.stack([tsdf, weights])

        # LM caches are stored at the VOLUME's storage dtype: every
        # iteration's tent evals re-read the (2, 6^3, N) cache from HBM
        # (~59 MB f32 at N=34k, ~100 iterations/frame), so bf16 storage
        # halves the dominant per-iteration traffic. On TPU the source
        # volumes are bf16 already (and the band cache is bf16-rounded
        # by construction), so the cast loses nothing; on CPU volumes
        # are f32 and the caches stay exact.
        cache_dtype = tsdf.dtype if tsdf.dtype == jnp.bfloat16 \
            else jnp.float32

        if use_band:
            from emfusion_tpu.geometry.band_capture import \
                band_capture_multi
            b_intr, b_h, b_w, b_SB, b_LB, b_axes, b_backend = band_args

            def recapture(R, t):
                c, a = band_capture_multi(
                    vols, points, R, t, voxel_size, b_intr, b_h, b_w,
                    b_SB, b_LB, axes=b_axes, backend=b_backend)
                return c.astype(cache_dtype), a
        else:
            def recapture(R, t):
                c, a = capture_neighborhoods(vols, points, R, t,
                                             voxel_size)
                return c.astype(cache_dtype), a

    def eval_system(R, t, cache, anchor):
        """Jacobian rows, residuals and combined weights at a pose.

        Gather path: one fused 27-corner neighborhood gather yields the
        margin-1 residual psi AND the finite-difference gradient (J
        translation part, ``kernel_computePoseGradients``,
        TSDF.cu:603-660). Capture path: tent-product evaluation from
        the per-point cache — no gather."""
        if use_capture:
            psi, g3 = sample_system_from_cache(
                cache[0], anchor, points, R, t, voxel_size, shape)
            intw = sample_value_from_cache(
                cache[1:2], anchor, points, R, t, voxel_size, shape,
                margin=1)[0]
        else:
            psi, g3 = sample_system_at_points(tsdf, points, R, t,
                                              voxel_size)
            intw = sample_volume_at_points(weights, points, R, t,
                                           voxel_size, margin=1)
        p = R @ points + t[:, None]                            # (3, N)
        grad_r = jnp.cross(p, g3, axis=0)
        J = jnp.concatenate([g3, grad_r], axis=0)              # (6, N)

        abs_psi = jnp.abs(psi)
        # cv::cuda::divide defines x/0 = 0, so psi==0 pixels get weight 0
        huber = jnp.where(abs_psi > 0,
                          jnp.minimum(cfg.huber_thresh / jnp.maximum(abs_psi,
                                                                     1e-30),
                                      1.0), 0.0)
        intw = jnp.minimum(intw, cfg.max_tsdf_weight)
        wmax = jnp.max(intw)
        intw = jnp.where(wmax > 0, intw / wmax, 0.0)
        w = huber * intw * assoc
        return psi, J, w, huber

    def build_normal_eqs(J, w, psi):
        Jw = J * w[None, :]          # (6, N)
        A = Jw @ J.T                 # (6, 6)
        b = Jw @ psi                 # (6,)
        return A, b

    def maybe_recapture(cache, anchor, recaps, R, t, skip):
        """Re-center the cached windows at (R, t) if any relevant point
        drifted outside (capture path only; a no-op branch otherwise).
        NOTE: ``lax.cond`` under ``vmap`` degenerates to select (both
        branches execute) — callers batching over volumes should scan,
        not vmap (see pipeline.track_objs_subset)."""
        ok = skip | (recaps >= cfg.max_recaptures) \
            | drift_ok(anchor, points, R, t, voxel_size, shape)

        def keep(_):
            return cache, anchor, recaps

        def recap(_):
            c, a = recapture(R, t)
            return c, a, recaps + 1

        return jax.lax.cond(ok, keep, recap, None)

    def body(s: _LMState) -> _LMState:
        # err = sum(w psi^2) at the current pose is carried in the state:
        # on reject iterations pose/weights are unchanged, so re-sampling
        # psi (the reference recomputes it per stage) would be a wasted
        # N-point gather.
        if use_capture:
            cache, anchor, recaps = maybe_recapture(
                s.cache, s.anchor, s.recaps, s.R, s.t,
                s.converged | ~s.eval_grad)
        else:
            cache, anchor, recaps = s.cache, s.anchor, s.recaps

        def do_eval(_):
            psi_e, J, w, hub = eval_system(s.R, s.t, cache, anchor)
            A, b = build_normal_eqs(J, w, psi_e)
            err = jnp.sum(w * psi_e * psi_e)
            conv = jnp.max(jnp.abs(b)) < cfg.eps1
            return J, w, A, b, err, hub, s.converged | conv

        def no_eval(_):
            return s.J, s.w, s.A, s.b, s.err, s.hub, s.converged

        J, w, A, b, err, hub, converged = jax.lax.cond(
            s.eval_grad & ~s.converged, do_eval, no_eval, None)

        def pose_update(_):
            mu0 = jnp.where(s.first, cfg.tau * jnp.max(jnp.diag(A)), s.mu)
            x = jnp.linalg.solve(A + mu0 * jnp.eye(6, dtype=f32), b)
            rel_vec = se3_log(_pose_mat(s.R, s.t))
            step_conv = jnp.linalg.norm(x) < cfg.eps2 * (
                jnp.linalg.norm(rel_vec) + cfg.eps2)

            dT = se3_exp(-x)
            R_new = dT[:3, :3] @ s.R
            t_new = dT[:3, :3] @ s.t + dT[:3, 3]
            if use_capture:
                c2, a2, rc2 = maybe_recapture(cache, anchor, recaps,
                                              R_new, t_new, step_conv)
                psi_new = sample_value_from_cache(
                    c2[0:1], a2, points, R_new, t_new, voxel_size,
                    shape, margin=1)[0]
            else:
                c2, a2, rc2 = cache, anchor, recaps
                psi_new = _sample_tsdf(tsdf, points, R_new, t_new,
                                       voxel_size)
            err_new = jnp.sum(w * psi_new * psi_new)
            gain = 0.5 * jnp.dot(x, mu0 * x + b)
            rho = (err - err_new) / jnp.where(jnp.abs(gain) > 1e-30, gain,
                                              1e-30)
            accept = rho > 0

            rho_fac = 1.0 - (2.0 * rho - 1.0) ** 3
            mu_acc = mu0 * jnp.maximum(1.0 / 3.0, rho_fac)
            mu_rej = mu0 * s.nu
            nu_new = jnp.where(accept, cfg.nu_init, s.nu * cfg.nu_init)

            do_step = ~step_conv
            return (
                jnp.where(do_step & accept, R_new, s.R),
                jnp.where(do_step & accept, t_new, s.t),
                jnp.where(do_step, jnp.where(accept, mu_acc, mu_rej), mu0),
                jnp.where(do_step, nu_new, s.nu),
                jnp.asarray(False),
                jnp.where(do_step, accept, s.eval_grad),
                converged | step_conv,
                c2, a2, rc2,
            )

        def no_update(_):
            return (s.R, s.t, s.mu, s.nu, s.first, s.eval_grad, converged,
                    cache, anchor, recaps)

        (R, t, mu, nu, first, eval_grad, converged2, cache, anchor,
         recaps) = jax.lax.cond(converged, no_update, pose_update, None)

        # err stays valid across reject iterations (pose unchanged); after
        # an accepted step the next do_eval refreshes it before use.
        return _LMState(R=R, t=t, mu=mu, nu=nu, first=first,
                        eval_grad=eval_grad, converged=converged2,
                        J=J, w=w, A=A, b=b, err=err, hub=hub, it=s.it + 1,
                        cache=cache, anchor=anchor, recaps=recaps)

    def cond(s: _LMState):
        return (s.it < cfg.max_iter) & ~s.converged

    active_flag = jnp.asarray(active, bool)
    if use_capture:
        # initial capture at the init pose; skipped for inactive slots
        # (callers batching over volumes must scan, not vmap)
        cache0, anchor0 = jax.lax.cond(
            active_flag,
            lambda _: recapture(rel_pose_co[:3, :3], rel_pose_co[:3, 3]),
            lambda _: (jnp.zeros((2, WIN, WIN, WIN, N), cache_dtype),
                       jnp.zeros((3, N), jnp.int32)),
            None)
    else:
        cache0 = jnp.zeros((2, 1, 1, 1, 1), f32)
        anchor0 = jnp.zeros((3, 1), jnp.int32)

    init = _LMState(
        R=rel_pose_co[:3, :3], t=rel_pose_co[:3, 3],
        mu=jnp.asarray(0.0, f32), nu=jnp.asarray(cfg.nu_init, f32),
        first=jnp.asarray(True), eval_grad=jnp.asarray(True),
        converged=jnp.asarray(~active_flag),
        J=jnp.zeros((6, N), f32), w=jnp.zeros((N,), f32),
        A=jnp.eye(6, dtype=f32), b=jnp.zeros((6,), f32),
        err=jnp.asarray(0.0, f32), hub=jnp.zeros((N,), f32),
        it=jnp.int32(0), cache=cache0, anchor=anchor0,
        recaps=jnp.int32(0))

    final = jax.lax.while_loop(cond, body, init)

    if use_band and cfg.refine_points > 0:
        M = min(int(cfg.refine_points), N)
        # top-M by the last combined weights (a stratified/random
        # subset was measured WORSE on both gate metrics; the tiny
        # assoc tiebreak keeps the selection meaningful when w is
        # all-zero). The top_k runs on a strided candidate subset —
        # a full 34k-point TPU sort costs ~4 ms for a 256-point pick.
        cs = max(1, N // max(8 * M, 1))
        score = (final.w + 1e-6 * assoc)[::cs]
        _, sidx = jax.lax.top_k(score, M)
        ridx = sidx * cs
        pts_r = jnp.take(points, ridx, axis=1)
        asc_r = jnp.take(assoc, ridx)
        cache_r, anchor_r = capture_neighborhoods(
            vols, pts_r, final.R, final.t, voxel_size)
        ref = _lm_fixed_cache(cache_r.astype(cache_dtype), anchor_r,
                              pts_r, asc_r, final.R, final.t,
                              voxel_size, shape, cfg, active_flag,
                              max_iter=int(cfg.refine_iters))
        final = final._replace(R=ref.R, t=ref.t,
                               it=final.it + ref.it)
    pose = _pose_mat(final.R, final.t)
    # final combined per-point weights (huber*int*assoc) and raw huber
    # weights at the last gradient eval — the reference's track_weights/
    # and huber_weights/ debug exports (EMFusion.cpp:1088-1131)
    stats = {"iterations": final.it, "converged": final.converged,
             "grad_norm": jnp.max(jnp.abs(final.b)),
             "track_weights": final.w, "huber_weights": final.hub,
             "recaptures": final.recaps}
    # capture path: points still outside their cached windows at the
    # final pose contributed nothing since the last re-capture (ADVICE
    # r3: make re-capture budget exhaustion observable in real runs)
    if use_capture:
        stats["dropped_points"] = out_of_window_count(
            final.anchor, points, final.R, final.t, voxel_size, shape)
    else:
        stats["dropped_points"] = jnp.int32(0)
    return pose, stats


def _lm_fixed_cache(cache, anchor, points, assoc, R0, t0, voxel_size,
                    shape, cfg: TrackConfig, active, max_iter: int):
    """LM while_loop against a FIXED capture cache (no in-loop
    recapture branch). The vmap-safe core of the batched object LM:
    ``lax.cond`` under ``vmap`` degenerates to select — both branches
    execute — so a vmapped loop must not contain the recapture call at
    all; drifted points drop out via the samplers' window masks, and
    ``track_volumes_batched`` re-captures BETWEEN staged halves
    instead. Same LM semantics as ``track_volume`` otherwise
    (TSDF.cpp:170-344)."""
    f32 = jnp.float32
    N = points.shape[1]

    def eval_system(R, t):
        psi, g3 = sample_system_from_cache(cache[0], anchor, points, R,
                                           t, voxel_size, shape)
        intw = sample_value_from_cache(cache[1:2], anchor, points, R, t,
                                       voxel_size, shape, margin=1)[0]
        p = R @ points + t[:, None]
        grad_r = jnp.cross(p, g3, axis=0)
        J = jnp.concatenate([g3, grad_r], axis=0)
        abs_psi = jnp.abs(psi)
        huber = jnp.where(abs_psi > 0,
                          jnp.minimum(cfg.huber_thresh /
                                      jnp.maximum(abs_psi, 1e-30), 1.0),
                          0.0)
        intw = jnp.minimum(intw, cfg.max_tsdf_weight)
        wmax = jnp.max(intw)
        intw = jnp.where(wmax > 0, intw / wmax, 0.0)
        w = huber * intw * assoc
        return psi, J, w, huber

    def body(s: _LMState) -> _LMState:
        def do_eval(_):
            psi_e, J, w, hub = eval_system(s.R, s.t)
            Jw = J * w[None, :]
            A = Jw @ J.T
            b = Jw @ psi_e
            err = jnp.sum(w * psi_e * psi_e)
            conv = jnp.max(jnp.abs(b)) < cfg.eps1
            return J, w, A, b, err, hub, s.converged | conv

        def no_eval(_):
            return s.J, s.w, s.A, s.b, s.err, s.hub, s.converged

        J, w, A, b, err, hub, converged = jax.lax.cond(
            s.eval_grad & ~s.converged, do_eval, no_eval, None)

        def pose_update(_):
            mu0 = jnp.where(s.first, cfg.tau * jnp.max(jnp.diag(A)),
                            s.mu)
            x = jnp.linalg.solve(A + mu0 * jnp.eye(6, dtype=f32), b)
            rel_vec = se3_log(_pose_mat(s.R, s.t))
            step_conv = jnp.linalg.norm(x) < cfg.eps2 * (
                jnp.linalg.norm(rel_vec) + cfg.eps2)
            dT = se3_exp(-x)
            R_new = dT[:3, :3] @ s.R
            t_new = dT[:3, :3] @ s.t + dT[:3, 3]
            psi_new = sample_value_from_cache(
                cache[0:1], anchor, points, R_new, t_new, voxel_size,
                shape, margin=1)[0]
            err_new = jnp.sum(w * psi_new * psi_new)
            gain = 0.5 * jnp.dot(x, mu0 * x + b)
            rho = (err - err_new) / jnp.where(jnp.abs(gain) > 1e-30,
                                              gain, 1e-30)
            accept = rho > 0
            rho_fac = 1.0 - (2.0 * rho - 1.0) ** 3
            mu_acc = mu0 * jnp.maximum(1.0 / 3.0, rho_fac)
            mu_rej = mu0 * s.nu
            nu_new = jnp.where(accept, cfg.nu_init, s.nu * cfg.nu_init)
            do_step = ~step_conv
            return (jnp.where(do_step & accept, R_new, s.R),
                    jnp.where(do_step & accept, t_new, s.t),
                    jnp.where(do_step,
                              jnp.where(accept, mu_acc, mu_rej), mu0),
                    jnp.where(do_step, nu_new, s.nu),
                    jnp.asarray(False),
                    jnp.where(do_step, accept, s.eval_grad),
                    converged | step_conv)

        def no_update(_):
            return (s.R, s.t, s.mu, s.nu, s.first, s.eval_grad,
                    converged)

        (R, t, mu, nu, first, eval_grad, converged2) = jax.lax.cond(
            converged, no_update, pose_update, None)
        return s._replace(R=R, t=t, mu=mu, nu=nu, first=first,
                          eval_grad=eval_grad, converged=converged2,
                          J=J, w=w, A=A, b=b, err=err, hub=hub,
                          it=s.it + 1)

    def cond(s: _LMState):
        return (s.it < max_iter) & ~s.converged

    active_flag = jnp.asarray(active, bool)
    init = _LMState(
        R=R0, t=t0, mu=jnp.asarray(0.0, f32),
        nu=jnp.asarray(cfg.nu_init, f32), first=jnp.asarray(True),
        eval_grad=jnp.asarray(True), converged=jnp.asarray(~active_flag),
        J=jnp.zeros((6, N), f32), w=jnp.zeros((N,), f32),
        A=jnp.eye(6, dtype=f32), b=jnp.zeros((6,), f32),
        err=jnp.asarray(0.0, f32), hub=jnp.zeros((N,), f32),
        it=jnp.int32(0), cache=jnp.zeros((1,), f32),
        anchor=jnp.zeros((1,), jnp.int32), recaps=jnp.int32(0))
    return jax.lax.while_loop(cond, body, init)


def track_volumes_batched(tsdf_k, weights_k, voxel_k, points_k, assoc_k,
                          rel_k, cfg: TrackConfig, active_k):
    """Batched multi-object LM: all pool slots tracked in ONE program.

    Replaces the host pipeline's per-slot unrolled LMs (the reference
    interleaves object stages across CUDA streams to overlap exactly
    this serialization, ``EMFusion.cpp:692-720``; the TPU analogue is
    batching). Structure:

      1. one BATCHED exact-gather capture of every slot's point
         neighborhoods (single flat take over the stacked volumes);
      2. a vmapped fixed-cache LM for the first half of the iteration
         budget (no in-loop recapture — see ``_lm_fixed_cache``);
      3. one unconditional batched re-capture at the updated poses
         (the serial path re-captures on drift; a fixed mid-schedule
         re-capture costs one capture for the whole pool and restores
         any points that drifted out of their windows in stage 2);
      4. a vmapped fixed-cache LM for the remaining budget.

    Args are stacked over slots: tsdf_k/weights_k (S, Z, Y, X),
    voxel_k (S,), points_k (S, 3, M), assoc_k (S, M), rel_k (S, 4, 4)
    camera-to-object, active_k (S,).

    Returns (poses (S, 4, 4), stats dict batched over S).
    """
    S = tsdf_k.shape[0]
    shape = tsdf_k.shape[1:]
    vols = jnp.stack([tsdf_k, weights_k], axis=1)     # (S, 2, Z, Y, X)
    cache_dtype = (tsdf_k.dtype if tsdf_k.dtype == jnp.bfloat16
                   else jnp.float32)

    R0 = rel_k[:, :3, :3]
    t0 = rel_k[:, :3, 3]
    cache, anchor = capture_neighborhoods_batched(vols, points_k, R0,
                                                  t0, voxel_k)
    cache = cache.astype(cache_dtype)

    half = max(cfg.max_iter // 2, 1)

    def lm(cache_, anchor_, pts, asc, R_, t_, vs, act, budget):
        return _lm_fixed_cache(cache_, anchor_, pts, asc, R_, t_, vs,
                               shape, cfg, act, budget)

    s1 = jax.vmap(lm, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))(
        cache, anchor, points_k, assoc_k, R0, t0, voxel_k, active_k,
        half)

    cache2, anchor2 = capture_neighborhoods_batched(
        vols, points_k, s1.R, s1.t, voxel_k)
    cache2 = cache2.astype(cache_dtype)
    # keep the stage-1 cache for slots that already converged (their
    # stats/pose are final; a fresh capture is unused work XLA prunes)
    s2 = jax.vmap(lm, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))(
        cache2, anchor2, points_k, assoc_k, s1.R, s1.t, voxel_k,
        active_k & ~s1.converged, cfg.max_iter - half)

    done1 = s1.converged
    R = jnp.where(done1[:, None, None], s1.R, s2.R)
    t = jnp.where(done1[:, None], s1.t, s2.t)
    pick = lambda a, b: jnp.where(  # noqa: E731
        done1.reshape((S,) + (1,) * (a.ndim - 1)), a, b)
    poses = jax.vmap(_pose_mat)(R, t)
    stats = {
        "iterations": s1.it + jnp.where(done1, 0, s2.it),
        "converged": jnp.where(done1, s1.converged, s2.converged),
        "track_weights": pick(s1.w, s2.w),
        "huber_weights": pick(s1.hub, s2.hub),
        "recaptures": jnp.where(done1, 0, 1) * jnp.ones((S,),
                                                        jnp.int32),
    }
    return poses, stats
