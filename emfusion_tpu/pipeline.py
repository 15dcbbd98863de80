"""EM-Fusion pipeline orchestrator.

TPU-native redesign of ``EMFusion`` (``src/core/EMFusion.cpp``,
``include/EMFusion/core/EMFusion.h``). Differences from the reference are
architectural, not behavioral:

  * The ``std::list<ObjTSDF>`` of dynamically allocated object volumes with
    per-object CUDA streams becomes a **fixed-size batched object pool**
    (static shapes for XLA): stacked ``(K, Z, Y, X)`` arrays with an active
    mask, processed with ``vmap`` — the analogue of per-object stream
    concurrency.
  * The per-frame E-step, camera LM loop, per-object LM loops, raycast
    compositing and depth integration each run as single jitted programs;
    there are no per-iteration host round-trips (the reference downloads
    the 6x6 system every LM iteration, ``src/core/TSDF.cpp:274-282``).
  * Object "resize" keeps the fixed grid resolution and rescales the voxel
    size, trilinearly resampling content (the reference grows the grid at
    fixed voxel size, ``src/core/ObjTSDF.cpp:80-165``); the voxel-aligned
    recenter offset bookkeeping (``obj_pose_offsets``) is preserved.
  * Object lifecycle logic (match/spawn/resize/delete) stays host-side at
    the mask cadence, as in the reference (``EMFusion.cpp:329-558``).

Processing order per frame follows ``EMFusion::processFrame``
(``EMFusion.cpp:70-129``) exactly: preprocess -> points -> E-step ->
track(camera) -> E-step -> track(objects) -> E-step -> raycast ->
store poses -> (mask frame: match/spawn) -> integrate depth -> integrate
masks -> cleanup.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from emfusion_tpu import segmentation as seg_mod
from emfusion_tpu.config import Params
from emfusion_tpu.geometry import (
    backproject_depth, preprocess_depth, pose_inverse, reorthonormalize,
)
from emfusion_tpu.geometry.sampling import sample_volume_at_points
from emfusion_tpu.ops.association import association_weights, \
    normalize_associations
from emfusion_tpu.ops.fusion import (
    integrate_tsdf, compute_gradients, integrate_fg_mask,
)
from emfusion_tpu.ops.fusion_pencil import (
    integrate_tsdf_pencil, pick_scan_axis,
)
from emfusion_tpu.ops.raycast import raycast_volume
from emfusion_tpu.ops.raycast_sweep import raycast_sweep
from emfusion_tpu.ops.render import render_phong, make_colormap
from emfusion_tpu.tracking import TrackConfig, track_volume
from emfusion_tpu.volume import fg_probs as compute_fg_probs


@struct.dataclass
class ObjectPool:
    """Batched object volumes (fixed K slots, static shapes)."""
    tsdf: jnp.ndarray        # (K, Z, Y, X)
    weights: jnp.ndarray     # (K, Z, Y, X)
    grads: jnp.ndarray       # (K, 3, Z, Y, X) channel-first
    fg_counts: jnp.ndarray   # (K, 2, Z, Y, X) channel-first
    pose: jnp.ndarray        # (K, 4, 4) object-to-world
    voxel_size: jnp.ndarray  # (K,)
    truncdist: jnp.ndarray   # (K,)
    active: jnp.ndarray      # (K,) bool
    visible: jnp.ndarray     # (K,) bool
    object_id: jnp.ndarray   # (K,) int32 global ids (0 = none)
    assoc: jnp.ndarray       # (K, H, W) association weights


@struct.dataclass
class PipelineState:
    bg_tsdf: jnp.ndarray
    bg_weights: jnp.ndarray
    bg_grads: jnp.ndarray
    bg_pose: jnp.ndarray     # (4, 4) constant volume pose
    bg_assoc: jnp.ndarray    # (H, W)
    cam_pose: jnp.ndarray    # (4, 4)
    objs: ObjectPool


@dataclasses.dataclass
class ObjectMeta:
    """Host-side per-object bookkeeping (reference ``ObjTSDF`` counters)."""
    ex_count: int = 0        # ObjTSDF.h:209-210: both start at 0; the
    nonex_count: int = 0     # creation frame's match loop raises ex to 1
    class_probs: Optional[np.ndarray] = None
    pose_offsets: Dict[int, np.ndarray] = dataclasses.field(
        default_factory=dict)

    @property
    def ex_prob(self) -> float:
        return self.ex_count / max(self.ex_count + self.nonex_count, 1)


logger = logging.getLogger("emfusion")


def _translate(t: np.ndarray) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = t
    return m


class EMFusionPipeline:
    """Host-facing pipeline driver (the ``EMFusion`` class equivalent)."""

    def __init__(self, params: Params,
                 mask_provider: Optional[seg_mod.MaskProvider] = None,
                 save_output: bool = False, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with ("obj", "z")
        axes (``distributed.mesh.make_mesh``). When given and larger
        than one device, the pipeline state is sharded over it at init
        (object pool over "obj", background volume Z over "z"), the
        background fusion runs through the no-allgather ``shard_map``
        kernel, and mesh exports use the z-sharded marching cubes. The
        single-chip Pallas backends are disabled in favor of the XLA
        paths (they are per-device programs; their shard_map variants
        are future work — the partitioner handles the XLA paths)."""
        self.params = params
        self.mesh = None
        if mesh is not None and mesh.size > 1:
            self.mesh = mesh
            import dataclasses as _dc
            # sharded runs force the partitionable XLA backends and the
            # static axis-2 scan (the shard_map fusion's layout)
            params = _dc.replace(
                params, fusion_backend="pencil",
                raycast_backend="sweep", estep_backend="gather",
                capture_backend="gather", bilateral_backend="xla")
            self.params = params
        self.mask_provider = mask_provider
        self.save_output = save_output
        self.frame = 0
        self.H, self.W = params.height, params.width
        self.K = params.max_objects
        self.obj_res = params.objVolumeDims[0]
        self.intr = jnp.asarray(params.intr)
        self.track_cfg = TrackConfig(
            tau=params.tsdfParams.tau, eps1=params.tsdfParams.eps1,
            eps2=params.tsdfParams.eps2, nu_init=params.tsdfParams.nu_init,
            huber_thresh=params.tsdfParams.huberThresh,
            max_tsdf_weight=params.tsdfParams.maxTSDFWeight,
            max_iter=params.maxTrackingIter,
            sampler=os.environ.get("EMF_TRACK_SAMPLER", "auto"),
            capture_backend=params.capture_backend,
            refine_points=params.camera_refine_points)
        self.colormap = make_colormap()

        # background volume storage dtype (bf16 halves the HBM traffic of
        # the bandwidth-bound fused update; see Params.volume_dtype)
        vd = params.volume_dtype
        if vd == "auto":
            vd = ("bfloat16" if jax.default_backend() not in ("cpu",)
                  else "float32")
        self._vol_dtype = (jnp.bfloat16 if vd == "bfloat16"
                           else jnp.float32)

        # camera motion model: "constvel" starts (and captures) the LM
        # at a constant-velocity pose prediction; "static" = reference
        # init at the previous pose. auto: constvel on TPU (each
        # avoided drift re-capture saves a banded volume sweep),
        # static on CPU (exact reference behavior for the gates).
        mm = params.motion_model
        if mm == "auto":
            mm = ("constvel" if jax.default_backend() not in ("cpu",)
                  else "static")
        self._mm = mm

        self.state = self._init_state()
        if self.mesh is not None:
            from emfusion_tpu.distributed.mesh import shard_state
            self.state = shard_state(self.state, self.mesh)
        self._next_id = 1
        self.meta: Dict[int, ObjectMeta] = {}
        # Host mirrors of the small lifecycle state. Every device->host
        # fetch through the TPU runtime costs a round trip (tens of ms
        # through the axon relay); the reference reads these freely from
        # host RAM. active/object_id only change in host lifecycle code
        # (spawn/delete), so exact mirrors are maintained there; visible
        # and the per-frame stats come back in ONE packed fetch per frame
        # (_frame_summary) instead of a dozen scattered np.asarray calls.
        self._h_active = np.zeros(self.K, bool)
        self._h_ids = np.zeros(self.K, np.int64)
        self._h_visible = np.zeros(self.K, bool)
        self._h_bg_pose = np.asarray(params.volume_pose_matrix(),
                                     np.float32)
        self._h_cam_pose = np.eye(4, dtype=np.float32)

        # trajectory + export storage (reference EMFusion.h:330-468)
        self._poses: Dict[int, np.ndarray] = {}
        self._obj_poses: Dict[int, Dict[int, np.ndarray]] = {}
        # frame index -> dataset timestamp (TUM eval writes stamps when
        # available, mirroring eval_tum.sh's index->timestamp substitution)
        self.timestamps: Dict[int, float] = {}
        self.outputs: Dict[str, dict] = {
            "bg_assoc_pre": {}, "bg_assoc_post": {},
            "obj_assoc_pre": {}, "obj_assoc_post": {},
            "renderings": {}, "masks": {}, "mask_vis": {},
            "track_weights_bg": {}, "huber_weights_bg": {},
            "obj_track_weights": {}, "obj_huber_weights": {},
            "fg_probs": {},
        }
        # last raycast results (host copies of what render() needs)
        self._last_raycast = None
        # deferred end-of-frame summary (see process_frame / flush)
        self._pending = None
        from emfusion_tpu.profiling import PhaseTimer
        self.timer = PhaseTimer()
        self._build_jits()

    # ------------------------------------------------------------------
    def _init_state(self) -> PipelineState:
        p = self.params
        X, Y, Z = p.globalVolumeDims
        Xo = Yo = Zo = self.obj_res
        K, H, W = self.K, self.H, self.W
        f32 = jnp.float32
        objs = ObjectPool(
            tsdf=jnp.zeros((K, Zo, Yo, Xo), f32),
            weights=jnp.zeros((K, Zo, Yo, Xo), f32),
            grads=jnp.zeros((K, 3, Zo, Yo, Xo), f32),
            fg_counts=jnp.zeros((K, 2, Zo, Yo, Xo), f32),
            pose=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
            voxel_size=jnp.ones((K,), f32),
            truncdist=jnp.ones((K,), f32),
            active=jnp.zeros((K,), bool),
            visible=jnp.zeros((K,), bool),
            object_id=jnp.zeros((K,), jnp.int32),
            assoc=jnp.zeros((K, H, W), f32),
        )
        return PipelineState(
            bg_tsdf=jnp.zeros((Z, Y, X), self._vol_dtype),
            bg_weights=jnp.zeros((Z, Y, X), self._vol_dtype),
            bg_grads=jnp.zeros((3, Z, Y, X), f32),
            bg_pose=jnp.asarray(p.volume_pose_matrix()),
            bg_assoc=jnp.ones((H, W), f32),   # EMFusion.cpp:55
            cam_pose=jnp.eye(4, dtype=f32),
            objs=objs,
        )

    # ------------------------------------------------------------------
    def _build_jits(self):
        p = self.params
        tsdfp = p.tsdfParams
        intr = self.intr
        H, W, K = self.H, self.W, self.K
        bg_trunc = p.global_truncdist
        bg_voxel = p.globalVoxelSize
        cfg = self.track_cfg
        max_steps = p.raycast_max_steps

        escale = p.estep_scale
        if escale == 0:
            escale = 1 if jax.default_backend() in ("cpu",) else 2
        escale = max(escale, 1)

        estep_backend = p.estep_backend
        if estep_backend == "auto":
            estep_backend = ("sweep"
                             if jax.default_backend() not in ("cpu",)
                             else "gather")
        # intrinsics of the escale-subsampled pixel grid (u' = u/escale)
        intr_e = (jnp.diag(jnp.asarray(
            [1.0 / escale, 1.0 / escale, 1.0], jnp.float32)) @ intr
            if escale > 1 else intr)

        def estep_subset(state: PipelineState, points, slots, bg_axis=2):
            """computeAssociationWeights (EMFusion.cpp:635-670), evaluated
            for the given object slots only (others keep zero weight, like
            inactive models in the reference's per-object loop).

            With estep_scale > 1, weights are computed on a subsampled
            pixel grid and nearest-upsampled back to (H, W).

            Background sampling: "sweep" backend replaces the per-point
            gather with the Pallas plane-sweep sampler (one streaming
            pass over the volume; ``bg_axis`` = static scan axis).

            Also returns the per-object sampled fg probabilities (the
            reference's getFgProbVals cache, EMFusion.cpp:120; fg_probs/
            export) when exports are enabled, else None."""
            pts = points[:, ::escale, ::escale] if escale > 1 else points
            rel_bg = pose_inverse(state.bg_pose) @ state.cam_pose
            if estep_backend == "sweep":
                from emfusion_tpu.ops.pallas.sweep_pallas import (
                    sweep_sample_psi_pallas)
                psi = sweep_sample_psi_pallas(
                    state.bg_tsdf, pts, rel_bg[:3, :3], rel_bg[:3, 3],
                    intr_e, bg_voxel, axis=bg_axis)
                # compute_laplace semantics (TSDF.cpp:138-156)
                lap = jnp.exp(-bg_trunc * jnp.abs(psi)
                              / tsdfp.assocSigma) / (2.0 * tsdfp.assocSigma)
                bg_w = tsdfp.alpha * lap + (1.0 - tsdfp.alpha) * \
                    tsdfp.uniPrior
                bg_w = jnp.where(psi == 0.0, 0.0, bg_w)
            else:
                bg_w, _ = association_weights(
                    state.bg_tsdf, pts, rel_bg[:3, :3], rel_bg[:3, 3],
                    bg_voxel, bg_trunc, tsdfp.assocSigma, tsdfp.alpha,
                    tsdfp.uniPrior)

            ph, pw = pts.shape[1], pts.shape[2]
            P = ph * pw
            ptsf = pts.reshape(3, P)
            Ms = p.estep_obj_subset
            use_subset = 0 < Ms < P

            def obj_assoc(tsdf, fgc, pose, vs, td):
                rel = pose_inverse(pose) @ state.cam_pose
                fgvol = compute_fg_probs(fgc)
                if not use_subset:
                    w, fg = association_weights(
                        tsdf, pts, rel[:3, :3], rel[:3, 3], vs, td,
                        tsdfp.assocSigma, tsdfp.alpha, tsdfp.uniPrior,
                        fg_prob_vol=fgvol)
                    return w, fg
                # Geometric culling (EXACT): a point outside the object
                # volume samples the reference's 0 sentinel -> weight 0
                # (ObjTSDF.cpp:189-200 via getVolumeVals), so only the
                # points inside the volume's bounding box need the
                # trilinear gathers — an object covers a small image
                # fraction, and these gathers were the E-step's dominant
                # cost at 16 objects (fenced: ~250 ms x3 per frame).
                po = rel[:3, :3] @ ptsf + rel[:3, 3:]
                half = (self.obj_res - 1) / 2.0 * vs
                inside = jnp.all(jnp.abs(po) <= half, axis=0) \
                    & (ptsf[2] > 0)
                # center-priority: if the bbox footprint exceeds the
                # budget (volPad makes it ~4x the mask area), drop the
                # bbox-corner points first — they carry at most the
                # uniform-prior weight, while the object's own pixels
                # cluster around the volume center
                score = jnp.where(inside, -jnp.sum(po * po, axis=0),
                                  -jnp.inf)
                _, idx = jax.lax.top_k(score, Ms)
                pts_s = jnp.take(ptsf, idx, axis=1)
                in_s = jnp.take(inside, idx)
                w_s, fg_s = association_weights(
                    tsdf, pts_s, rel[:3, :3], rel[:3, 3], vs, td,
                    tsdfp.assocSigma, tsdfp.alpha, tsdfp.uniPrior,
                    fg_prob_vol=fgvol)
                w = jnp.zeros((P,), jnp.float32).at[idx].set(
                    jnp.where(in_s, w_s, 0.0)).reshape(ph, pw)
                fg = jnp.zeros((P,), jnp.float32).at[idx].set(
                    jnp.where(in_s, fg_s, 0.0)).reshape(ph, pw)
                return w, fg

            o = state.objs

            def take(arr):
                return jnp.take(arr, slots, axis=0)

            obj_w_sub, obj_fg_sub = jax.vmap(obj_assoc)(
                take(o.tsdf), take(o.fg_counts), take(o.pose),
                take(o.voxel_size), take(o.truncdist))
            obj_w = jnp.zeros((K, ph, pw), jnp.float32
                              ).at[slots].set(obj_w_sub)
            bg_n, obj_n = normalize_associations(bg_w, obj_w, o.active)

            def up(img):
                img = jnp.repeat(img, escale, axis=-2)
                img = jnp.repeat(img, escale, axis=-1)
                return img[..., :H, :W]

            if escale > 1:
                bg_n, obj_n = up(bg_n), up(obj_n)
            fg_out = None
            if self.save_output:
                fg_out = up(obj_fg_sub) if escale > 1 else obj_fg_sub
            return state.replace(bg_assoc=bg_n,
                                 objs=o.replace(assoc=obj_n)), fg_out

        def estep(state: PipelineState, points):
            state, _ = estep_subset(state, points,
                                    jnp.arange(K, dtype=jnp.int32))
            return state

        stride = p.tracking_stride
        if stride == 0:
            stride = 1 if jax.default_backend() in ("cpu",) else 3
        # static per-object LM point budget (subset mode, see track_obj);
        # Params.obj_track_points, 0 = all points
        OBJ_TRACK_POINTS = p.obj_track_points if p.obj_track_points > 0 \
            else (1 << 30)

        def _track_pts(points, assoc):
            """Subsampled tracking points + matching association weights."""
            pts = points[:, ::stride, ::stride].reshape(3, -1)
            return pts, assoc[::stride, ::stride].reshape(-1)

        hs = (H + stride - 1) // stride
        ws = (W + stride - 1) // stride

        # Banded sweep-capture for the LM (geometry/band_capture.py):
        # one streaming volume pass instead of the ~140 ms per-point
        # HBM gather. Production default on TPU; "gather" forces the
        # exact per-point reads.
        cap_backend = p.capture_backend
        if cap_backend == "auto":
            cap_backend = ("band"
                           if jax.default_backend() not in ("cpu",)
                           else "gather")
        if cap_backend == "band":
            from emfusion_tpu.geometry.band_capture import grid_dims_for
            SB_t, LB_t = grid_dims_for(hs, ws)
            scale_t = jnp.asarray(
                [1.0 / stride, 1.0 / stride, 1.0], jnp.float32)
            intr_t = jnp.diag(scale_t) @ intr
            band_backend = ("xla"
                            if jax.default_backend() in ("cpu",)
                            else "pallas")

            def _band_args(axis):
                axes = (axis,) + tuple(a for a in (2, 1, 0)
                                       if a != axis)
                return (intr_t, hs, ws, SB_t, LB_t, axes, band_backend)
        else:
            def _band_args(axis):
                return None

        def track_camera(state: PipelineState, points, delta=None,
                         bg_axis=2):
            """Camera-vs-background LM (performTracking, first half).
            Returns (state, track-weight image, huber-weight image), both
            (H/stride, W/stride). ``bg_axis``: static scan axis for the
            band capture sweep.

            ``delta``: optional (4, 4) predicted inter-frame motion
            (constant-velocity model, host-computed from the last two
            recorded poses). The LM starts — and captures — at the
            predicted pose, so frame-scale motion no longer drifts the
            initial capture out of its windows (each avoided re-capture
            saves a full banded volume sweep). The reference starts at
            the previous pose (EMFusion.cpp:675); identity restores
            that."""
            pred = (state.cam_pose if delta is None
                    else state.cam_pose @ delta)
            pts, asc = _track_pts(points, state.bg_assoc)
            rel_init = reorthonormalize(
                pose_inverse(state.bg_pose) @ pred)
            rel, stats = track_volume(
                state.bg_tsdf, state.bg_weights, bg_voxel,
                pts, asc, rel_init, cfg,
                band_args=_band_args(bg_axis))
            tw = stats["track_weights"].reshape(hs, ws)
            hw = stats["huber_weights"].reshape(hs, ws)
            dbg = jnp.stack([stats["iterations"].astype(jnp.float32),
                             stats["recaptures"].astype(jnp.float32),
                             stats["dropped_points"].astype(jnp.float32)])
            return state.replace(cam_pose=state.bg_pose @ rel), tw, hw, dbg

        def track_objs_subset(state: PipelineState, points, slots,
                              serial: bool = True, subset_unroll: int = 0):
            """Object LM over the given pool slots only (the reference
            loops over live objects, EMFusion.cpp:692-720; running just
            the active subset avoids paying K x the gather cost).

            ``serial=True`` (host pipeline): slots run one-by-one — vmap
            would turn the LM while_loop's lax.conds into selects, so
            every object would pay the gradient-eval gather / capture
            re-gather every iteration (the reference also runs objects
            one stream each). ``serial=False`` (single-jit multi-device
            step): vmap over slots with the gather sampler, so the pool
            axis stays shardable over the "obj" mesh axis — a scan would
            serialize across devices.

            ``subset_unroll``: static slot count; > 0 runs ONE batched
            multi-object LM (``tracking.track_volumes_batched``): every
            slot's top-4096 association-weighted point subset is
            captured with a single flat gather over the stacked
            volumes and all slots iterate in one vmapped fixed-cache
            loop with a staged mid-budget re-capture — the 16-object
            marginal cost is one batched program instead of 16
            sequential subset LMs (the reference overlaps its per-
            object stages across CUDA streams, EMFusion.cpp:692-720).
            The band capture applies to the camera only; small object
            volumes track poorly from in-plane resampled bands. 0 scans
            the slots with full-point LMs (CPU/reference-exact
            path)."""
            o = state.objs
            cam_pose = state.cam_pose
            tcfg = (cfg if serial
                    else dataclasses.replace(cfg, sampler="gather"))

            def track_obj(tsdf, weights, vs, pose, assoc, active):
                pts, asc = _track_pts(points, assoc)
                rel_o, st = track_volume(
                    tsdf, weights, vs, pts, asc, rel_i_of(pose), tcfg,
                    active=active)
                tw = st["track_weights"]
                hw = st["huber_weights"]
                # ObjTSDF::syncTrack: pose = cam_pose * rel^-1
                return (cam_pose @ pose_inverse(rel_o),
                        tw.reshape(hs, ws), hw.reshape(hs, ws))

            def rel_i_of(pose):
                return reorthonormalize(pose_inverse(pose) @ cam_pose)

            def take(arr):
                return jnp.take(arr, slots, axis=0)

            xs = (take(o.tsdf), take(o.weights), take(o.voxel_size),
                  take(o.pose), take(o.assoc), take(o.active))
            if serial and subset_unroll:
                from emfusion_tpu.tracking import track_volumes_batched
                tsdf_k, w_k, vs_k, pose_k, assoc_k, act_k = xs
                pts_full, _ = _track_pts(points, state.bg_assoc)
                N_full = pts_full.shape[1]
                M = min(OBJ_TRACK_POINTS, N_full)
                asc_all = jax.vmap(
                    lambda a: a[::stride, ::stride].reshape(-1))(assoc_k)
                _, idx = jax.lax.top_k(asc_all, M)          # (S, M)
                pts_s = jax.vmap(
                    lambda i: jnp.take(pts_full, i, axis=1))(idx)
                asc_s = jnp.take_along_axis(asc_all, idx, axis=1)
                rel_k = jax.vmap(
                    lambda pz: reorthonormalize(
                        pose_inverse(pz) @ cam_pose))(pose_k)
                rel_out, st = track_volumes_batched(
                    tsdf_k, w_k, vs_k, pts_s, asc_s, rel_k, cfg, act_k)
                new_sub = jax.vmap(
                    lambda r: cam_pose @ pose_inverse(r))(rel_out)
                tw_sub = jnp.zeros((subset_unroll, N_full), jnp.float32)
                tw_sub = jax.vmap(lambda z, i, v: z.at[i].set(v))(
                    tw_sub, idx, st["track_weights"]).reshape(
                        subset_unroll, hs, ws)
                hw_sub = jnp.zeros((subset_unroll, N_full), jnp.float32)
                hw_sub = jax.vmap(lambda z, i, v: z.at[i].set(v))(
                    hw_sub, idx, st["huber_weights"]).reshape(
                        subset_unroll, hs, ws)
            elif serial:
                def scan_body(carry, x):
                    return carry, track_obj(*x)

                _, (new_sub, tw_sub, hw_sub) = jax.lax.scan(
                    scan_body, None, xs)
            else:
                new_sub, tw_sub, hw_sub = jax.vmap(track_obj)(*xs)
            new_sub = jnp.where(take(o.active)[:, None, None], new_sub,
                                take(o.pose))
            poses = o.pose.at[slots].set(new_sub)
            return state.replace(objs=o.replace(pose=poses)), tw_sub, hw_sub

        self._cap_band = cap_backend == "band"

        def track_all(state: PipelineState, points):
            """performTracking (EMFusion.cpp:672-724): camera LM, E-step,
            then all objects batched (full-pool variant used by the
            single-jit frame step / sharding dry runs)."""
            state, _, _, _ = track_camera(state, points)
            state = estep(state, points)
            state, _, _ = track_objs_subset(state, points,
                                            jnp.arange(K, dtype=jnp.int32),
                                            serial=False)
            return state

        rc_backend = p.raycast_backend
        if rc_backend == "auto":
            rc_backend = ("sweep_pallas"
                          if jax.default_backend() not in ("cpu",)
                          else "march")

        def _rc(tsdf, grads, weights, rel_rot, rel_trans, vs, td,
                small=False, axis=2):
            if rc_backend == "sweep_pallas" and not small:
                # Pallas streaming sweep for the (large) background
                # volume; object volumes stay on the XLA sweep — the
                # call is vmapped over the pool and their 64^3 grids
                # are cheap.
                from emfusion_tpu.ops.pallas.sweep_pallas import (
                    raycast_sweep_pallas)
                return raycast_sweep_pallas(tsdf, weights, rel_rot,
                                            rel_trans, intr, vs, td,
                                            H, W, axis=axis)
            if rc_backend in ("sweep", "sweep_pallas"):
                return raycast_sweep(tsdf, weights, rel_rot, rel_trans,
                                     intr, vs, td, H, W,
                                     bf16=p.matmul_bf16,
                                     grid=(256, 256) if small else None,
                                     axis=axis)
            return raycast_volume(tsdf, grads, weights, rel_rot, rel_trans,
                                  intr, vs, td, H, W, max_steps=max_steps)

        def raycast_subset(state: PipelineState, slots, bg_axis=2):
            """EMFusion::raycast (EMFusion.cpp:726-795): parallel raycasts +
            nearest-surface composite + bg override + visibility, over the
            given object slots (full-K outputs scattered back).
            ``bg_axis``: static scan axis for the background sweep."""
            rel_bg = pose_inverse(state.bg_pose) @ state.cam_pose
            bg_rc = _rc(state.bg_tsdf, state.bg_grads, state.bg_weights,
                        rel_bg[:3, :3], rel_bg[:3, 3], bg_voxel, bg_trunc,
                        axis=bg_axis)

            o = state.objs
            n_sub = slots.shape[0]

            def take(arr):
                return jnp.take(arr, slots, axis=0)

            def obj_rc_fn(tsdf, grads, weights, fgc, pose, vs, td):
                rel = pose_inverse(pose) @ state.cam_pose
                fgvol = compute_fg_probs(fgc)
                rc_weights = jnp.where(fgvol > 0.5, weights, 0.0)
                return _rc(tsdf, grads, rc_weights, rel[:3, :3],
                           rel[:3, 3], vs, td, small=True)

            sub_active = take(o.active)
            sub_ids = take(o.object_id)
            if n_sub > 0:
                obj_rc = jax.vmap(obj_rc_fn)(
                    take(o.tsdf), take(o.grads), take(o.weights),
                    take(o.fg_counts), take(o.pose), take(o.voxel_size),
                    take(o.truncdist))
                obj_hit = obj_rc["mask"] & sub_active[:, None, None]
                obj_ray = jnp.where(obj_hit, obj_rc["raylengths"], jnp.inf)
                best = jnp.argmin(obj_ray, axis=0)                 # (H, W)
                min_ray = jnp.min(obj_ray, axis=0)
                any_obj = jnp.isfinite(min_ray)

                def take_best(stack):
                    idx = best[None, None] if stack.ndim == 4 else best[None]
                    return jnp.take_along_axis(stack, idx, axis=0)[0]

                comp_ray = jnp.where(any_obj, min_ray, 0.0)
                comp_verts = jnp.where(any_obj[None],
                                       take_best(obj_rc["vertices"]), 0.0)
                comp_norms = jnp.where(any_obj[None],
                                       take_best(obj_rc["normals"]), 0.0)
                seg = jnp.where(any_obj, sub_ids[best], 0)
                obj_masks = jnp.zeros((K, H, W), bool).at[slots].set(
                    obj_rc["mask"] & sub_active[:, None, None])
            else:
                any_obj = jnp.zeros((H, W), bool)
                comp_ray = jnp.zeros((H, W), jnp.float32)
                comp_verts = jnp.zeros((3, H, W), jnp.float32)
                comp_norms = jnp.zeros((3, H, W), jnp.float32)
                seg = jnp.zeros((H, W), jnp.int32)
                obj_masks = jnp.zeros((K, H, W), bool)

            # bg override where bg is >5cm nearer (EMFusion.cpp:773-776)
            take_bg = bg_rc["mask"] & any_obj & \
                (comp_ray - bg_rc["raylengths"] > 0.05)
            seg = jnp.where(take_bg, 0, seg)
            no_obj = seg == 0
            vertices = jnp.where(no_obj[None], bg_rc["vertices"],
                                 comp_verts)
            normals = jnp.where(no_obj[None], bg_rc["normals"],
                                comp_norms)

            # visibility: enough seg pixels inside the boundary-eroded frame
            b = p.boundary
            inner = jnp.zeros((H, W), bool).at[b:H - b, b:W - b].set(True)
            seg_in = jnp.where(inner, seg, 0)
            vis_counts = jax.vmap(
                lambda oid: jnp.sum((seg_in == oid) & (oid > 0)))(
                    o.object_id)
            visible = o.active & (vis_counts > p.visibilityThresh)

            state = state.replace(objs=o.replace(visible=visible))
            return state, {
                "vertices": vertices, "normals": normals, "seg": seg,
                "raylengths": comp_ray, "bg_raylengths": bg_rc["raylengths"],
                "obj_masks": obj_masks,
                "vis_counts": vis_counts,
            }

        def raycast_all(state: PipelineState):
            return raycast_subset(state, jnp.arange(K, dtype=jnp.int32))

        backend = p.fusion_backend
        if backend == "auto":
            backend = ("pallas" if jax.default_backend() not in ("cpu",)
                       else "gather")
        if backend == "pallas":
            # Pallas slice kernel: VMEM-resident warped grids + on-the-fly
            # one-hot matmul gathers + fused elementwise update; streams
            # the volume in (1, Y, X) blocks at the storage dtype.
            import functools as _ft
            from emfusion_tpu.ops.pallas.fusion_pencil_pallas import \
                integrate_tsdf_pencil_pallas
            fuse_fn = _ft.partial(
                integrate_tsdf_pencil_pallas,
                interpret=jax.default_backend() == "cpu")
            # object volumes stay on the XLA pencil path: the call is
            # vmapped over the pool and pallas_call under vmap would
            # re-trace per slot; their 64^3 grids are not HBM-bound.
            obj_fuse_fn = _ft.partial(integrate_tsdf_pencil,
                                      bf16=p.matmul_bf16, grid=(256, 256),
                                      windowed=False)
        elif backend == "pencil":
            import functools as _ft
            fuse_fn = _ft.partial(integrate_tsdf_pencil,
                                  bf16=p.matmul_bf16)
            # object volumes: small static reference grid (their windows
            # are clipped to the object footprint); windowed=False —
            # the call is vmapped over the pool and vmapped lax.switch
            # would execute every ladder rung
            obj_fuse_fn = _ft.partial(integrate_tsdf_pencil,
                                      bf16=p.matmul_bf16, grid=(256, 256),
                                      windowed=False)
        else:
            fuse_fn = integrate_tsdf
            obj_fuse_fn = integrate_tsdf

        def integrate_subset(state: PipelineState, depth, slots, bg_axis=2):
            """integrateDepth (EMFusion.cpp:865-889): bg + the given
            object slots (visible ones actually update). ``bg_axis``:
            static scan axis for the background pencil fusion.

            Mesh runs: the background update goes through the z-sharded
            ``shard_map`` fusion — each device scans only its local Z
            slices, NO volume all-gather (HLO-audited in
            tests/test_distributed.py)."""
            rel_bg_oc = pose_inverse(state.cam_pose) @ state.bg_pose
            # bg free-space carving (Params.bg_carve_dist /
            # bg_carve_weight_cap); None = exact reference semantics
            bg_carve = (min(p.bg_carve_dist, bg_trunc)
                        if p.bg_carve_dist > 0 else None)
            bg_cap = (p.bg_carve_weight_cap
                      if (bg_carve is not None
                          and p.bg_carve_weight_cap
                          < tsdfp.maxTSDFWeight) else None)
            bg_margin = (p.bg_carve_margin
                         if (bg_cap is not None
                             and p.bg_carve_margin > -2.0) else None)
            if self.mesh is not None and self.mesh.shape["z"] > 1:
                from emfusion_tpu.distributed.sharded_ops import \
                    integrate_tsdf_pencil_zsharded
                bg_t, bg_w = integrate_tsdf_pencil_zsharded(
                    self.mesh, state.bg_tsdf, state.bg_weights, depth,
                    state.bg_assoc, rel_bg_oc[:3, :3],
                    rel_bg_oc[:3, 3], intr, bg_voxel, bg_trunc,
                    tsdfp.maxTSDFWeight, bf16=p.matmul_bf16,
                    carve_dist=bg_carve, carve_weight_cap=bg_cap,
                    carve_margin=bg_margin)
            else:
                kw = ({"axis": bg_axis}
                      if backend in ("pencil", "pallas") else {})
                bg_t, bg_w = fuse_fn(
                    state.bg_tsdf, state.bg_weights, depth,
                    state.bg_assoc, rel_bg_oc[:3, :3],
                    rel_bg_oc[:3, 3], intr, bg_voxel, bg_trunc,
                    tsdfp.maxTSDFWeight, carve_dist=bg_carve,
                    carve_weight_cap=bg_cap, carve_margin=bg_margin,
                    **kw)
            # preserve the storage dtype (XLA paths compute/return f32)
            bg_t = bg_t.astype(state.bg_tsdf.dtype)
            bg_w = bg_w.astype(state.bg_weights.dtype)
            # the gradient volume is only consumed by the lock-step march
            # raycast; tracking samples gradients from TSDF differences
            # and exports compute gradients on demand. Skipping it on the
            # sweep path saves a 4x-volume-traffic pass per frame.
            bg_g = (compute_gradients(bg_t.astype(jnp.float32))
                    if rc_backend == "march" else state.bg_grads)

            o = state.objs
            state = state.replace(bg_tsdf=bg_t, bg_weights=bg_w,
                                  bg_grads=bg_g)
            if slots.shape[0] == 0:
                return state

            def take(arr):
                return jnp.take(arr, slots, axis=0)

            def obj_int(tsdf, weights, grads, pose, vs, td, assoc, upd):
                rel_oc = pose_inverse(state.cam_pose) @ pose
                t2, w2 = obj_fuse_fn(tsdf, weights, depth, assoc,
                                     rel_oc[:3, :3], rel_oc[:3, 3], intr,
                                     vs, td, tsdfp.maxTSDFWeight)
                g2 = compute_gradients(t2)
                t2 = jnp.where(upd, t2, tsdf)
                w2 = jnp.where(upd, w2, weights)
                g2 = jnp.where(upd, g2, grads)
                return t2, w2, g2

            upd = take(o.active) & take(o.visible)
            t2, w2, g2 = jax.vmap(obj_int)(
                take(o.tsdf), take(o.weights), take(o.grads), take(o.pose),
                take(o.voxel_size), take(o.truncdist), take(o.assoc), upd)
            return state.replace(objs=o.replace(
                tsdf=o.tsdf.at[slots].set(t2),
                weights=o.weights.at[slots].set(w2),
                grads=o.grads.at[slots].set(g2)))

        def integrate(state: PipelineState, depth):
            return integrate_subset(state, depth,
                                    jnp.arange(K, dtype=jnp.int32))

        def integrate_masks(state: PipelineState, masks, occls, do_mask):
            """integrateMasks (EMFusion.cpp:891-906) batched over slots."""
            o = state.objs

            def one(tsdf, weights, fgc, pose, vs, mask, occl, upd):
                rel_oc = pose_inverse(state.cam_pose) @ pose
                fgc2 = integrate_fg_mask(tsdf, weights, fgc, mask, occl,
                                         rel_oc[:3, :3], rel_oc[:3, 3], intr,
                                         vs)
                return jnp.where(upd, fgc2, fgc)

            fgc2 = jax.vmap(one)(o.tsdf, o.weights, o.fg_counts, o.pose,
                                 o.voxel_size, masks, occls,
                                 do_mask & o.active)
            return state.replace(objs=o.replace(fg_counts=fgc2))

        use_pallas_bilateral = (jax.default_backend() not in ("cpu",)
                                and p.bilateral_backend != "xla")

        def preprocess(depth_raw):
            if use_pallas_bilateral:
                from emfusion_tpu.ops.pallas.bilateral_pallas import \
                    bilateral_filter_pallas
                depth = bilateral_filter_pallas(
                    depth_raw, p.bilateral_kernel_size,
                    p.bilateral_sigma_depth, p.bilateral_sigma_spatial)
                depth = jnp.where(jnp.isnan(depth), 0.0, depth)
                depth = jnp.where(depth_raw == 0.0, 0.0, depth)
            else:
                depth = preprocess_depth(depth_raw, p.bilateral_kernel_size,
                                         p.bilateral_sigma_depth,
                                         p.bilateral_sigma_spatial)
            points = backproject_depth(depth, intr)
            return depth, points

        def frame_track(state, points):
            state = estep(state, points)
            pre_bg, pre_obj = state.bg_assoc, state.objs.assoc
            state = track_all(state, points)
            state = estep(state, points)
            state, rc = raycast_all(state)
            return state, pre_bg, pre_obj, rc

        self._preprocess = jax.jit(preprocess)
        self._estep = jax.jit(estep)
        self._frame_track = jax.jit(frame_track)
        self._integrate = jax.jit(integrate)
        self._integrate_subset = jax.jit(integrate_subset,
                                         static_argnames=("bg_axis",))
        self._integrate_masks = jax.jit(integrate_masks)
        # split frame-step pieces (process_frame path: lets the object LM
        # run over the active slot subset only)
        self._track_camera = jax.jit(track_camera,
                                     static_argnames=("bg_axis",))
        self._track_objs_subset = jax.jit(
            track_objs_subset, static_argnames=("serial", "subset_unroll"))
        self._estep_subset = jax.jit(estep_subset,
                                     static_argnames=("bg_axis",))
        self._raycast_all = jax.jit(raycast_all)
        self._raycast_subset = jax.jit(raycast_subset,
                                       static_argnames=("bg_axis",))
        self._scan_axis_dynamic = (self.mesh is None
                                   and (backend in ("pencil", "pallas")
                                        or rc_backend == "sweep"))
        # raw (unjitted) versions for custom jit wrapping (sharded runs,
        # __graft_entry__, benchmarks)
        self._frame_track_fn = frame_track
        self._integrate_fn = integrate
        self._estep_fn = estep
        self._preprocess_fn = preprocess

        # --- mask-frame helpers -------------------------------------
        def mask_iou(a, b):
            inter = jnp.sum(a & b)
            union = jnp.sum(a | b)
            return inter / jnp.maximum(union, 1)

        self._mask_iou = jax.jit(mask_iou)

        def mask_iou_matrix(masks, seg, ids):
            """(n, K) IoU of every detection mask against every slot's
            reprojected model mask (seg == object_id) — ONE jitted call +
            ONE fetch replaces the reference's per-(mask, object) loop
            reads (EMFusion.cpp:418-455); per-pair fetches through the
            TPU relay cost a full RTT each."""
            obj_masks = seg[None] == ids[:, None, None]      # (K, H, W)

            def one_det(m):
                inter = jnp.sum(m[None] & obj_masks, axis=(1, 2))
                union = jnp.sum(m[None] | obj_masks, axis=(1, 2))
                return inter / jnp.maximum(union, 1)

            return jax.vmap(one_det)(masks)                  # (n, K)

        self._mask_iou_matrix = jax.jit(mask_iou_matrix)
        self._count_nonzero = jax.jit(lambda m: jnp.sum(m))

        def masked_percentiles(pts, valid):
            """Per-axis independent 10/90 percentiles of masked points —
            reproduces computePercentiles (EMFusion.cu:77-98): sort each
            axis independently, pick index int(count*0.1)/int(count*0.9)."""
            n = jnp.sum(valid)
            big = jnp.where(valid[:, None], pts, jnp.inf)
            srt = jnp.sort(big, axis=0)
            i10 = (n.astype(jnp.float32) * 0.1).astype(jnp.int32)
            i90 = (n.astype(jnp.float32) * 0.9).astype(jnp.int32)
            p10 = srt[jnp.clip(i10, 0, pts.shape[0] - 1)]
            p90 = srt[jnp.clip(i90, 0, pts.shape[0] - 1)]
            return p10, p90, n

        self._masked_percentiles = jax.jit(masked_percentiles)

        def spawn_percentiles(pts_w, valid, poses):
            """All device math of initNewObjVolume's geometric checks in
            ONE call (EMFusion.cpp:495-558): world-frame percentiles of
            the masked points plus per-slot object-frame percentiles (for
            volumeIOU) — one fetch instead of one per active slot."""
            p10w, p90w, nv = masked_percentiles(pts_w, valid)

            def per_slot(pose):
                T = pose_inverse(pose)
                pts_o = pts_w @ T[:3, :3].T + T[:3, 3]
                p10, p90, _ = masked_percentiles(pts_o, valid)
                return p10, p90

            p10o, p90o = jax.vmap(per_slot)(poses)
            return jnp.concatenate([
                p10w, p90w, nv[None].astype(jnp.float32),
                p10o.reshape(-1), p90o.reshape(-1)])

        self._spawn_percentiles = jax.jit(spawn_percentiles)

        def surface_and_new_percentiles(tsdf, weights, fgc, vs, new_pts,
                                        new_valid):
            """Percentiles over (near-surface fg voxels) ∪ (new points),
            both in the object frame. TPU replacement for the reference's
            mesh-vertex + filtered-point percentile input
            (EMFusion.cpp:838-855). The voxel proxy must approximate the
            MESH VERTEX set (zero-crossing shell, ~1 voxel thick): using
            the whole truncation band would flood the percentile set with
            interior voxels and suppress resizes the reference performs
            (mesh vertices ~ |tsdf| near 0, getMesh / TSDF.cpp:356-373)."""
            Z, Y, X = tsdf.shape
            fgvol = compute_fg_probs(fgc)
            near = (weights > 0) & (fgvol > 0.5) & (jnp.abs(tsdf) < 0.1)
            zi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 0)
            yi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 1)
            xi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 2)
            vox = jnp.stack([(xi - (X - 1) / 2) * vs,
                             (yi - (Y - 1) / 2) * vs,
                             (zi - (Z - 1) / 2) * vs], -1).reshape(-1, 3)
            pts = jnp.concatenate([vox, new_pts], axis=0)
            valid = jnp.concatenate([near.reshape(-1), new_valid], axis=0)
            return masked_percentiles(pts, valid)

        self._surface_new_percentiles = jax.jit(surface_and_new_percentiles)

        def resample_slot(tsdf, weights, fgc, old_vs, new_vs, center):
            """Rescale-and-recenter an object volume into the same fixed
            grid (replaces ObjTSDF::resize's grow-and-copy,
            ObjTSDF.cpp:96-165). New grid positions (relative to the new
            center) are sampled trilinearly from the old grid.

            TSDF values are stored normalized by truncdist, and truncdist
            scales with the voxel size (data.h: objRelTruncDist * voxel)
            — the reference never rescales so never faces this; here the
            non-saturated band is renormalized by old/new truncdist so
            metric distances stay consistent across resizes. Saturated
            voxels (|t| ~ 1) carry no metric information and keep their
            sign (they would otherwise leak into the new, wider band)."""
            Z, Y, X = tsdf.shape
            res = jnp.array([X, Y, Z], jnp.float32)
            zi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 0)
            yi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 1)
            xi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 2)
            vx = ((xi - (X - 1) / 2) * new_vs + center[0]) / old_vs \
                + (X - 1.0) / 2.0
            vy = ((yi - (Y - 1) / 2) * new_vs + center[1]) / old_vs \
                + (Y - 1.0) / 2.0
            vz = ((zi - (Z - 1) / 2) * new_vs + center[2]) / old_vs \
                + (Z - 1.0) / 2.0
            ok = (vx >= 0) & (vy >= 0) & (vz >= 0) \
                & (vx + 1 < X) & (vy + 1 < Y) & (vz + 1 < Z)
            from emfusion_tpu.geometry.sampling import \
                trilinear_sample, trilinear_sample_channels
            t2 = trilinear_sample(tsdf, vx, vy, vz, ok)
            w2 = trilinear_sample(weights, vx, vy, vz, ok)
            f2 = trilinear_sample_channels(fgc, vx, vy, vz, ok)
            ratio = old_vs / new_vs
            t2 = jnp.where(jnp.abs(t2) < 0.999, t2 * ratio,
                           jnp.sign(t2))
            g2 = compute_gradients(t2)
            return t2, w2, g2, f2

        self._resample_slot = jax.jit(resample_slot)

        def cleanup_stats(state: PipelineState, obj_masks, match_masks,
                          have_match):
            """Per-slot association stats for cleanUpObjs
            (EMFusion.cpp:936-949) computed on device: mask = raycast
            object mask OR (matched segmentation mask, when present);
            returns (pixel count, sum of this object's association weight
            over the mask) per slot — only 2K scalars leave the device."""
            o = state.objs

            def one(own, match, hm, a):
                m = own | (match & hm)
                return jnp.sum(m), jnp.sum(jnp.where(m, a, 0.0))

            cnt, asum = jax.vmap(one)(obj_masks, match_masks, have_match,
                                      o.assoc)
            return cnt, asum

        def cleanup_stats_nomatch(state: PipelineState, obj_masks):
            """Common-case variant (no matched segmentation this frame):
            avoids uploading a (K, H, W) zero mask array per frame."""
            o = state.objs

            def one(own, a):
                return jnp.sum(own), jnp.sum(jnp.where(own, a, 0.0))

            return jax.vmap(one)(obj_masks, o.assoc)

        self._cleanup_stats = jax.jit(cleanup_stats)
        self._cleanup_stats_nomatch = jax.jit(cleanup_stats_nomatch)

        def pose_pack(state: PipelineState):
            """Camera + object poses as one flat vector (one fetch)."""
            return jnp.concatenate([state.cam_pose.reshape(-1),
                                    state.objs.pose.reshape(-1)])

        def frame_summary(state: PipelineState, obj_masks, vis_counts):
            """Everything the host needs at end of frame, packed into ONE
            f32 vector: [cam_pose(16), obj_poses(16K), vis_counts(K),
            assoc pixel counts(K), assoc weight sums(K)] — a single
            device->host round trip replaces the reference's free host
            reads (it keeps these in host RAM; we pay a relay RTT per
            fetch)."""
            cnt, asum = cleanup_stats_nomatch(state, obj_masks)
            return jnp.concatenate([
                pose_pack(state), vis_counts.astype(jnp.float32),
                cnt.astype(jnp.float32), asum])

        self._pose_pack = jax.jit(pose_pack)
        self._frame_summary = jax.jit(frame_summary)

    # ------------------------------------------------------------------
    # host-side frame processing
    # ------------------------------------------------------------------
    def prefetch_depth(self, depth_raw: np.ndarray) -> None:
        """Start the NEXT frame's host->device depth upload now, so it
        overlaps this frame's queued device work (the upload is the
        single largest fixed host cost per frame on a tunneled device —
        ~27 ms at the relay's ~45 MB/s for 640x480 f32). The next
        ``process_frame`` call picks the buffer up when its depth is
        the same array object; callers that never prefetch are
        unaffected."""
        import jax as _jax
        # hold the host array itself (not just id()) so the identity
        # test below cannot alias a recycled id
        self._prefetched = (depth_raw,
                            _jax.device_put(np.asarray(depth_raw)))

    def process_frame(self, rgb: Optional[np.ndarray],
                      depth_raw: np.ndarray,
                      timestamp: Optional[float] = None) -> None:
        p = self.params
        self._consume_pending()    # previous frame's deferred summary
        if timestamp is not None:
            self.timestamps[self.frame] = float(timestamp)
        pf = getattr(self, "_prefetched", None)
        if pf is not None and pf[0] is depth_raw:
            depth_dev = pf[1]
            self._prefetched = None
        else:
            depth_dev = jnp.asarray(depth_raw)
        with self.timer.phase("preprocess"):
            depth, points = self._preprocess(depth_dev)

        rc = None
        self._frame_spawned = []
        if self.frame > 0:
            slots = jnp.asarray(np.nonzero(self._h_active)[0], jnp.int32)
            with self.timer.phase("estep_pre"):
                state, _ = self._estep_subset(
                    self.state, points, slots,
                    bg_axis=self._bg_scan_axis())
            pre_bg = state.bg_assoc
            pre_obj = state.objs.assoc
            with self.timer.phase("track_camera"):
                state, track_w, huber_w, track_dbg = self._track_camera(
                    state, points, delta=self._motion_delta(),
                    bg_axis=self._bg_scan_axis())
                if os.environ.get("EMF_TRACK_STATS"):
                    import sys as _sys
                    it_, rc_, dp_ = np.asarray(track_dbg)
                    print(f"frame {self.frame} camera LM: {int(it_)} "
                          f"iters, {int(rc_)} recaptures, "
                          f"{int(dp_)} dropped pts",
                          file=_sys.stderr, flush=True)
            if self.save_output:
                self.outputs["track_weights_bg"][self.frame] = \
                    np.asarray(track_w)
                self.outputs["huber_weights_bg"][self.frame] = \
                    np.asarray(huber_w)
            with self.timer.phase("estep_mid"):
                state, _ = self._estep_subset(
                    state, points, slots,
                    bg_axis=self._bg_scan_axis())   # EMFusion.cpp:687
            if len(slots) > 0:
                with self.timer.phase("track_objects"):
                    state, obj_tw, obj_hw = self._track_objs_subset(
                        state, points, slots,
                        subset_unroll=(len(slots) if self._cap_band
                                       else 0))
                if self.save_output:
                    ids_now = np.asarray(state.objs.object_id)
                    slot_ids = [int(ids_now[int(s)]) for s in
                                np.asarray(slots)]
                    self.outputs["obj_track_weights"][self.frame] = {
                        oid: np.asarray(obj_tw[i])
                        for i, oid in enumerate(slot_ids)}
                    self.outputs["obj_huber_weights"][self.frame] = {
                        oid: np.asarray(obj_hw[i])
                        for i, oid in enumerate(slot_ids)}
            with self.timer.phase("estep_post"):
                state, fg_imgs = self._estep_subset(
                    state, points, slots,
                    bg_axis=self._bg_scan_axis())  # post-track, :87
            if self.save_output and fg_imgs is not None and len(slots) > 0:
                ids_now = np.asarray(state.objs.object_id)
                self.outputs["fg_probs"][self.frame] = {
                    int(ids_now[int(s)]): np.asarray(fg_imgs[i])
                    for i, s in enumerate(np.asarray(slots))}
            with self.timer.phase("raycast"):
                state, rc = self._raycast_subset(
                    state, slots, bg_axis=self._bg_scan_axis())
            self.state = state
            self._last_raycast = rc
            if self.save_output:
                self.outputs["bg_assoc_pre"][self.frame] = np.asarray(pre_bg)
                self.outputs["bg_assoc_post"][self.frame] = np.asarray(
                    self.state.bg_assoc)
                ids = np.asarray(self.state.objs.object_id)
                act = np.asarray(self.state.objs.active)
                pre_o = np.asarray(pre_obj)
                post_o = np.asarray(self.state.objs.assoc)
                self.outputs["obj_assoc_pre"][self.frame] = {
                    int(ids[k]): pre_o[k] for k in range(self.K) if act[k]}
                self.outputs["obj_assoc_post"][self.frame] = {
                    int(ids[k]): post_o[k] for k in range(self.K) if act[k]}

        matches: Dict[int, np.ndarray] = {}
        num_instances = -1
        mask_frame = self.frame % p.maskRCNNFrames == 0
        if mask_frame:
            # poses must be recorded BEFORE updateObj applies resize pose
            # offsets (reference stores at EMFusion.cpp:96, before
            # initOrMatchObjs) -> fetch them now; on ordinary frames the
            # poses ride the end-of-frame summary fetch instead.
            with self.timer.phase("store_poses"):
                self._apply_store_poses(
                    np.asarray(self._pose_pack(self.state)))
            with self.timer.phase("masks"):
                num_instances = self._init_or_match_objs(rgb, points, rc,
                                                         matches)

        with self.timer.phase("integrate"):
            islots = jnp.asarray(np.nonzero(self._h_active)[0], jnp.int32)
            self.state = self._integrate_subset(
                self.state, depth, islots, bg_axis=self._bg_scan_axis())

        if num_instances > 0:
            with self.timer.phase("integrate_masks"):
                self._apply_mask_integration(matches, rc)

        # ---- end-of-frame summary: the ONE device->host fetch of an
        # ordinary frame, issued ASYNC here and consumed at the next
        # frame's start (or flush()). The blocking fetch costs a ~28 ms
        # relay RTT on the tunneled TPU; deferring the consumption
        # overlaps it with the next frame's enqueue. The reference's
        # cleanUpObjs runs at the very end of processFrame
        # (EMFusion.cpp:922-980) and nothing touches the state between
        # two frames, so consuming at the next frame's start is
        # semantically identical.
        with self.timer.phase("summary"):
            if rc is not None:
                s_dev = self._frame_summary(self.state, rc["obj_masks"],
                                            rc["vis_counts"])
            else:
                s_dev = self._pose_pack(self.state)
            try:
                s_dev.copy_to_host_async()
            except Exception:
                pass
            self._pending = dict(
                frame=self.frame, summary=s_dev, had_rc=rc is not None,
                rc=rc, mask_frame=mask_frame,
                num_instances=num_instances, matches=matches,
                spawned=list(self._frame_spawned))

        self.frame += 1

    # ------------------------------------------------------------------
    def _consume_pending(self):
        """Apply the deferred end-of-frame summary: pose recording,
        visibility mirrors and object cleanup for the previous frame."""
        pend = self._pending
        if pend is None:
            return
        self._pending = None
        p = self.params
        with self.timer.phase("summary_wait"):
            s = np.asarray(pend["summary"])
        frame = pend["frame"]
        cnt = asum = None
        if pend["had_rc"]:
            off = 16 + 16 * self.K
            poses_flat = s[:off]
            vis = s[off:off + self.K]
            cnt = s[off + self.K:off + 2 * self.K]
            asum = s[off + 2 * self.K:off + 3 * self.K]
            # per-frame lifecycle stats mirror (debug/monitoring)
            self.last_frame_stats = {"frame": frame, "vis_counts": vis,
                                     "assoc_pixels": cnt,
                                     "assoc_sums": asum}
            vis_h = self._h_active & (vis > p.visibilityThresh)
            for k in pend["spawned"]:
                vis_h[k] = True    # spawned after that frame's raycast
            self._h_visible = vis_h
        else:
            poses_flat = s
        if not pend["mask_frame"]:
            self._apply_store_poses(poses_flat, frame=frame)
        with self.timer.phase("cleanup"):
            self._clean_up_objs(pend["num_instances"], pend["matches"],
                                pend["rc"], cnt, asum, frame=frame)

    def flush(self):
        """Consume any deferred end-of-frame summary. Called
        automatically at the next process_frame; call it before reading
        poses/state/meshes after the last frame."""
        self._consume_pending()

    # ------------------------------------------------------------------
    def _motion_delta(self):
        """Constant-velocity camera prediction (Params.motion_model):
        the inter-frame motion between the last two RECORDED poses
        (host mirrors; current through frame-1 after _consume_pending).
        None = static model (reference init, EMFusion.cpp:675)."""
        if self._mm != "constvel":
            return None
        fs = sorted(self._poses)
        if len(fs) < 2:
            return None
        d = np.linalg.inv(self._poses[fs[-2]]) @ self._poses[fs[-1]]
        return jnp.asarray(d.astype(np.float32))

    def _bg_scan_axis(self) -> int:
        """Static scan axis for the background pencil/sweep programs —
        the volume axis most aligned with the camera optical axis
        (host-side: each value compiles its own cached program variant).
        Uses the last *fetched* camera pose (<= 1 frame old — avoiding a
        mid-frame device sync; the argmax axis choice is insensitive to
        frame-scale motion)."""
        if not self._scan_axis_dynamic:
            return 2
        rel_co = np.linalg.inv(self._h_bg_pose) @ self._h_cam_pose
        return pick_scan_axis(rel_co)

    # ------------------------------------------------------------------
    def _apply_store_poses(self, poses_flat: np.ndarray, frame=None):
        """storePoses (EMFusion.cpp:96) from the packed pose fetch."""
        if frame is None:
            frame = self.frame
        cam = poses_flat[:16].reshape(4, 4).copy()
        self._poses[frame] = cam
        self._h_cam_pose = cam
        obj = poses_flat[16:16 + 16 * self.K].reshape(self.K, 4, 4)
        for k in range(self.K):
            if self._h_active[k]:
                self._obj_poses.setdefault(
                    int(self._h_ids[k]), {})[frame] = obj[k].copy()

    def _refresh_host_mirrors(self):
        """Re-derive the host mirrors from device state (used after
        checkpoint restore / direct state injection)."""
        self._pending = None   # any deferred summary is now stale
        o = self.state.objs
        self._h_active = np.asarray(o.active).copy()
        self._h_ids = np.asarray(o.object_id).astype(np.int64)
        self._h_visible = np.asarray(o.visible).copy()
        self._h_bg_pose = np.asarray(self.state.bg_pose).copy()
        self._h_cam_pose = np.asarray(self.state.cam_pose).copy()

    def _slot_of(self, obj_id: int) -> int:
        for k in range(self.K):
            if self._h_active[k] and self._h_ids[k] == obj_id:
                return k
        return -1

    # ------------------------------------------------------------------
    def _init_or_match_objs(self, rgb, points, rc, matches) -> int:
        """initOrMatchObjs (EMFusion.cpp:329-373)."""
        p = self.params
        if self.mask_provider is None:
            return -1
        dets = self.mask_provider.detect(rgb, self.frame)
        if dets is None:
            return -1
        dets = seg_mod.filter_detections(dets, p.FILTER_CLASSES,
                                         p.STATIC_OBJECTS,
                                         min_pixels=p.mask_min_pixels)
        if self.save_output:
            self.outputs["masks"][self.frame] = [d.mask for d in dets]
            from emfusion_tpu.viz import visualize_detections
            self.outputs["mask_vis"][self.frame] = \
                visualize_detections(rgb, dets)   # MaskRCNN::visualize
        n = len(dets)
        if n == 0:
            return 0

        depth_np = np.asarray(points)[2]
        valid_points = depth_np > 0
        cam = self._h_cam_pose   # fetched at mask-frame start
        pts_w = (np.asarray(points).reshape(3, -1).T @ cam[:3, :3].T
                 + cam[:3, 3]).astype(np.float32)

        seg_map = np.asarray(rc["seg"]) if rc is not None else \
            np.zeros((self.H, self.W), np.int32)

        score_matches: Dict[int, np.ndarray] = {}
        unmatched: List[int] = []
        masks = [d.mask.copy() for d in dets]

        ids = self._h_ids
        active = self._h_active
        visible = self._h_visible

        # --- matchSegmentation (EMFusion.cpp:418-455, 797-825)
        # one jitted (n, K) IoU matrix + one fetch instead of a device
        # round trip per (mask, slot) pair
        iou_mat = None
        if self.frame > 0 and n > 0 and np.any(active & visible):
            iou_mat = np.asarray(self._mask_iou_matrix(
                jnp.asarray(np.stack(masks)), jnp.asarray(seg_map),
                jnp.asarray(ids.astype(np.int32))))
            iou_mat = np.where((active & visible)[None, :], iou_mat, 0.0)
        match_det: Dict[int, int] = {}   # object id -> matched det index
        for i in range(n):
            matched_id = -1
            if iou_mat is not None:
                k_best = int(np.argmax(iou_mat[i]))
                best_iou = float(iou_mat[i, k_best])
                if best_iou > 0:
                    matched_id = int(ids[k_best])
                if best_iou <= p.matchIOUThresh:
                    matched_id = -1
                if matched_id >= 0 and matched_id in matches:
                    # conflict: keep the mask with better IOU vs the
                    # reprojected model mask; the contested mask index then
                    # goes through the unmatched path (and is killed there
                    # by overlap subtraction) — EMFusion.cpp:430-454
                    prev_iou = float(iou_mat[match_det[matched_id], k_best])
                    if best_iou > prev_iou:
                        matches[matched_id] = masks[i].copy()
                        score_matches[matched_id] = dets[i].scores
                        match_det[matched_id] = i
                    matched_id = -1
            if matched_id >= 0:
                matches[matched_id] = masks[i]
                score_matches[matched_id] = dets[i].scores
                match_det[matched_id] = i
            else:
                unmatched.append(i)

        # --- initObjsFromUnmatched (EMFusion.cpp:457-493)
        for i in unmatched:
            for k in range(self.K):
                if not active[k]:
                    continue
                oid = int(ids[k])
                obj_mask = seg_map == oid
                if oid in matches:
                    obj_mask = obj_mask | matches[oid]
                pre = np.count_nonzero(masks[i])
                masks[i] = masks[i] & ~obj_mask
                if pre > 0 and np.count_nonzero(masks[i]) / pre < 0.5:
                    masks[i][:] = False
            mask = valid_points & masks[i]
            new_id = self._init_new_obj_volume(mask, pts_w, cam)
            if new_id >= 0:
                matches[new_id] = masks[i]
                score_matches[new_id] = dets[i].scores
                # refresh host views after spawn
                ids = self._h_ids
                active = self._h_active

        # --- update matched objects (EMFusion.cpp:359-369)
        for k in range(self.K):
            if not active[k]:
                continue
            oid = int(ids[k])
            meta = self.meta[oid]
            if oid in matches:
                offset = self._update_obj(k, oid, pts_w,
                                          valid_points & matches[oid],
                                          score_matches.get(oid))
                if np.any(offset != 0):
                    meta.pose_offsets[self.frame] = offset
                meta.ex_count += 1
            else:
                meta.nonex_count += 1
        return n

    # ------------------------------------------------------------------
    def _init_new_obj_volume(self, mask, pts_w, cam) -> int:
        """initNewObjVolume (EMFusion.cpp:495-558)."""
        p = self.params
        if np.count_nonzero(mask) < p.visibilityThresh:
            return -1
        valid = jnp.asarray(mask.reshape(-1))

        # ONE packed fetch: world percentiles + per-slot object-frame
        # percentiles (volumeIOU inputs, EMFusion.cpp:560-612)
        active = self._h_active
        vsizes = np.asarray(self.state.objs.voxel_size)
        s = np.asarray(self._spawn_percentiles(
            jnp.asarray(pts_w), valid, self.state.objs.pose))
        p10, p90 = s[0:3], s[3:6]
        p10o = s[7:7 + 3 * self.K].reshape(self.K, 3)
        p90o = s[7 + 3 * self.K:7 + 6 * self.K].reshape(self.K, 3)
        for k in range(self.K):
            if not active[k]:
                continue
            if self._volume_iou(k, vsizes[k], p10o[k],
                                p90o[k]) > p.volIOUThresh:
                return -1

        center = (p10 + p90) / 2
        if np.linalg.norm(center - cam[:3, 3]) > p.distanceThresh:
            return -1
        vol_size = p.volPad * float(np.max(p90 - p10))
        if vol_size <= 0:
            return -1

        slot = int(np.argmin(active))  # first free slot
        if active[slot]:
            logger.warning("frame %d: object pool full (%d slots) — "
                           "refusing to spawn a new object", self.frame,
                           self.K)
            return -1
        voxel = vol_size / self.obj_res
        trunc = p.objRelTruncDist * voxel
        pose = _translate(center.astype(np.float32))

        o = self.state.objs
        zero3 = jnp.zeros_like(o.tsdf[0])
        new_id = self._next_id
        self._next_id += 1
        o = o.replace(
            tsdf=o.tsdf.at[slot].set(zero3),
            weights=o.weights.at[slot].set(zero3),
            grads=o.grads.at[slot].set(0.0),
            fg_counts=o.fg_counts.at[slot].set(0.0),
            pose=o.pose.at[slot].set(jnp.asarray(pose)),
            voxel_size=o.voxel_size.at[slot].set(voxel),
            truncdist=o.truncdist.at[slot].set(trunc),
            active=o.active.at[slot].set(True),
            visible=o.visible.at[slot].set(True),
            object_id=o.object_id.at[slot].set(new_id),
            assoc=o.assoc.at[slot].set(1.0),   # createObj: assoc=1
        )
        self.state = self.state.replace(objs=o)
        self._h_active[slot] = True
        self._h_visible[slot] = True
        self._h_ids[slot] = new_id
        self._frame_spawned.append(slot)
        # exCount starts at 0 (ObjTSDF.h:209-210); the creation frame's
        # match loop then applies updateExProb(true) -> 1
        # (EMFusion.cpp:359-365: new objects are in `matches`)
        self.meta[new_id] = ObjectMeta(ex_count=0, nonex_count=0)
        self._obj_poses.setdefault(new_id, {})[self.frame] = pose
        # reference: "Created new object" (EMFusion.cpp:555)
        logger.info("frame %d: created object %d (slot %d, voxel %.4f m, "
                    "center %s)", self.frame, new_id, slot, voxel,
                    np.round(center, 3).tolist())
        return new_id

    def _volume_iou(self, slot, voxel, p10, p90) -> float:
        """volumeIOU (EMFusion.cpp:560-612) — host math."""
        p = self.params
        center = (p10 + p90) / 2
        vol_size = p.volPad * float(np.max(p90 - p10))
        low_new = center - vol_size / 2
        high_new = center + vol_size / 2
        half = (self.obj_res - 1) * voxel / 2
        low, high = -np.full(3, half), np.full(3, half)
        vol_old = float(np.prod(np.full(3, self.obj_res * voxel)))
        vol_new = vol_size ** 3
        low_i = np.maximum(low_new, low)
        high_i = np.minimum(high_new, high)
        dims = high_i - low_i
        if np.any(dims < 0):
            return 0.0
        vol_int = float(np.prod(dims))
        return vol_int / (vol_new + vol_old - vol_int)

    # ------------------------------------------------------------------
    def _update_obj(self, slot, oid, pts_w, mask, scores) -> np.ndarray:
        """updateObj (EMFusion.cpp:827-863): class probs + resize."""
        meta = self.meta[oid]
        if scores is not None:
            if meta.class_probs is None:
                meta.class_probs = np.asarray(scores, np.float64).copy()
            else:
                meta.class_probs += np.asarray(scores)

        valid = mask.reshape(-1)
        if valid.sum() == 0:
            return np.zeros(3, np.float32)

        o = self.state.objs
        T = np.linalg.inv(np.asarray(o.pose[slot]))
        pts_o = (pts_w @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        p10, p90, _ = self._surface_new_percentiles(
            o.tsdf[slot], o.weights[slot], o.fg_counts[slot],
            o.voxel_size[slot], jnp.asarray(pts_o), jnp.asarray(valid))
        p10, p90 = np.asarray(p10), np.asarray(p90)
        return self._resize_obj(slot, p10, p90)

    def _resize_obj(self, slot, p10, p90) -> np.ndarray:
        """Recenter/rescale (replaces ObjTSDF::resize, ObjTSDF.cpp:80-165).

        Grid resolution stays fixed; the voxel size is rescaled so the
        fixed grid covers the reference's grown extent. The voxel-aligned
        recenter offset is preserved (returned for pose-offset logging).
        """
        p = self.params
        o = self.state.objs
        voxel = float(np.asarray(o.voxel_size[slot]))
        half = (self.obj_res - 1) * voxel / 2
        contained = np.all(p10 >= -half) and np.all(p90 <= half)
        if contained or not np.all(np.isfinite(p10)) \
                or not np.all(np.isfinite(p90)):
            return np.zeros(3, np.float32)

        new_center = (p10 + p90) / 2
        pix_offset = (new_center / voxel).astype(np.int32)  # trunc like Vec3i
        new_center = pix_offset.astype(np.float32) * voxel

        new_dims = p90 - p10
        new_vol_vox = p.volPad * float(np.max(new_dims)) / voxel
        new_res = (int(np.ceil(new_vol_vox)) + 1) // 2 * 2
        new_voxel = new_res * voxel / self.obj_res

        pose = np.asarray(o.pose[slot])
        pose = pose @ _translate(new_center)

        t2, w2, g2, f2 = self._resample_slot(
            o.tsdf[slot], o.weights[slot], o.fg_counts[slot],
            voxel, new_voxel, jnp.asarray(new_center))
        o = o.replace(
            tsdf=o.tsdf.at[slot].set(t2),
            weights=o.weights.at[slot].set(w2),
            grads=o.grads.at[slot].set(g2),
            fg_counts=o.fg_counts.at[slot].set(f2),
            pose=o.pose.at[slot].set(jnp.asarray(pose)),
            voxel_size=o.voxel_size.at[slot].set(new_voxel),
        )
        self.state = self.state.replace(objs=o)
        oid = int(np.asarray(o.object_id[slot]))
        self._obj_poses.setdefault(oid, {})[self.frame] = pose
        return new_center.astype(np.float32)

    # ------------------------------------------------------------------
    def _apply_mask_integration(self, matches, rc):
        """integrateMasks (EMFusion.cpp:891-906)."""
        K, H, W = self.K, self.H, self.W
        masks = np.zeros((K, H, W), bool)
        occls = np.zeros((K, H, W), bool)
        do = np.zeros((K,), bool)
        ids = self._h_ids
        active = self._h_active
        seg_map = np.asarray(rc["seg"]) if rc is not None else \
            np.zeros((H, W), np.int32)
        own_masks = np.asarray(rc["obj_masks"]) if rc is not None else \
            np.zeros((K, H, W), bool)
        for k in range(K):
            oid = int(ids[k])
            if not active[k] or oid not in matches:
                continue
            comp_mask = seg_map == oid
            occls[k] = own_masks[k] & ~comp_mask  # occluded pixels
            masks[k] = matches[oid]
            do[k] = True
        if do.any():
            self.state = self._integrate_masks(
                self.state, jnp.asarray(masks), jnp.asarray(occls),
                jnp.asarray(do))

    # ------------------------------------------------------------------
    def _clean_up_objs(self, num_instances, matches, rc,
                       cnt=None, asum=None, frame=None):
        """cleanUpObjs (EMFusion.cpp:922-980). ``cnt``/``asum``: per-slot
        association stats pre-fetched by the frame-summary pack (ordinary
        frames); when a matched segmentation exists this frame they are
        recomputed with the mask OR'd in (reference :940-943)."""
        p = self.params
        if frame is None:
            frame = self.frame
        ids = self._h_ids
        active = self._h_active
        visible = self._h_visible

        spurious = set()
        if num_instances > 0:
            for k in range(self.K):
                if active[k] and \
                        self.meta[int(ids[k])].ex_prob < p.existenceThresh:
                    oid = int(ids[k])
                    spurious.add(oid)
                    # reference deletion logs (EMFusion.cpp:929-934)
                    logger.info(
                        "frame %d: object %d existence prob %.3f < %.3f "
                        "-> delete", frame, oid,
                        self.meta[oid].ex_prob, p.existenceThresh)

        check = [k for k in range(self.K) if active[k] and visible[k]]
        if check and rc is not None:
            any_match = any(int(ids[k]) in matches for k in check)
            if any_match:
                match_masks = np.zeros((self.K, self.H, self.W), bool)
                have_match = np.zeros((self.K,), bool)
                for k in check:
                    oid = int(ids[k])
                    if oid in matches:
                        match_masks[k] = matches[oid]
                        have_match[k] = True
                cnt, asum = self._cleanup_stats(
                    self.state, rc["obj_masks"], jnp.asarray(match_masks),
                    jnp.asarray(have_match))
            elif cnt is None:
                cnt, asum = self._cleanup_stats_nomatch(
                    self.state, rc["obj_masks"])
            cnt, asum = np.asarray(cnt), np.asarray(asum)
            for k in check:
                oid = int(ids[k])
                if p.assocThresh * float(cnt[k]) > float(asum[k]):
                    spurious.add(oid)
                    # "tracking likely failed" (EMFusion.cpp:936-949)
                    logger.info("frame %d: object %d association below "
                                "threshold -> delete", frame, oid)

        delete_slots = []
        for k in range(self.K):
            if not active[k]:
                continue
            oid = int(ids[k])
            if oid in spurious or not visible[k]:
                if oid not in spurious:
                    logger.info("frame %d: object %d not visible -> "
                                "delete", frame, oid)   # :951-960
                delete_slots.append(k)

        if delete_slots:
            o = self.state.objs
            for k in delete_slots:
                o = o.replace(
                    active=o.active.at[k].set(False),
                    visible=o.visible.at[k].set(False),
                    assoc=o.assoc.at[k].set(0.0),
                )
                self._h_active[k] = False
                self._h_visible[k] = False
            self.state = self.state.replace(objs=o)

    # ------------------------------------------------------------------
    def render(self) -> np.ndarray:
        """Phong-rendered composited model view (EMFusion::render).

        With ``ignore_person`` set, pixels belonging to person-class
        objects are removed from the composited maps before shading
        (``EMFusion.cpp:139-150``)."""
        self._consume_pending()    # apply deletions before rendering
        if self._last_raycast is None:
            return np.zeros((self.H, self.W, 3), np.uint8)
        rc = self._last_raycast
        seg = np.asarray(rc["seg"])
        verts = rc["vertices"]
        norms = rc["normals"]
        if self.params.ignore_person:
            person_id = seg_mod.CLASS_NAMES.index("person")
            person_ids = [oid for oid, m in self.meta.items()
                          if m.class_probs is not None
                          and int(np.argmax(m.class_probs)) == person_id]
            if person_ids:
                drop = np.isin(seg, person_ids)
                seg = np.where(drop, 0, seg)
                keep = jnp.asarray(~drop)
                verts = jnp.where(keep[None], verts, 0.0)
                norms = jnp.where(keep[None], norms, 0.0)
        img = render_phong(verts, norms, jnp.asarray(seg) % 256,
                           jnp.asarray(self.colormap))
        return np.asarray(img)

    @property
    def poses(self) -> Dict[int, np.ndarray]:
        """Per-frame camera poses (storePoses). Reading consumes any
        deferred end-of-frame summary, so ``pipe.poses[f]`` is valid
        right after ``process_frame`` returns (reference contract)."""
        self._consume_pending()
        return self._poses

    @property
    def obj_poses(self) -> Dict[int, Dict[int, np.ndarray]]:
        self._consume_pending()
        return self._obj_poses

    @property
    def active_object_ids(self) -> List[int]:
        self._consume_pending()
        ids = self._h_ids
        active = self._h_active
        return [int(ids[k]) for k in range(self.K) if active[k]]

    @property
    def cam_pose(self) -> np.ndarray:
        return np.asarray(self.state.cam_pose)
