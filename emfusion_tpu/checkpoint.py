"""Checkpoint / resume for the EM-Fusion pipeline.

The reference has no fault tolerance: all results live in RAM until
``writeResults`` at exit (``src/core/EMFusion.cpp:253-292``). For
long-running / production deployments the full SLAM state — background
and object volumes, poses, host-side lifecycle bookkeeping, trajectories
— is checkpointable as a single archive and restorable mid-sequence.

Format: one ``.npz`` (every array leaf of the device state pytree plus
trajectory arrays) + embedded JSON for host metadata. Written atomically
(tmp + rename) so a crash mid-write never corrupts the latest checkpoint.
"""

from __future__ import annotations

import io
import json
import os
from typing import Dict

import numpy as np


def _flatten_state(state) -> Dict[str, np.ndarray]:
    """PipelineState -> flat dict of numpy arrays."""
    out = {}
    for name in ("bg_tsdf", "bg_weights", "bg_grads", "bg_pose", "bg_assoc",
                 "cam_pose"):
        arr = np.asarray(getattr(state, name))
        # compressed (bf16) volume storage has no portable npz dtype;
        # checkpoints always hold f32 (load casts back to the state dtype)
        if arr.dtype not in (np.float32, np.float64, np.int32, np.int64,
                             np.bool_):
            arr = arr.astype(np.float32)
        out[name] = arr
    for name in ("tsdf", "weights", "grads", "fg_counts", "pose",
                 "voxel_size", "truncdist", "active", "visible", "object_id",
                 "assoc"):
        out[f"objs.{name}"] = np.asarray(getattr(state.objs, name))
    return out


def save_checkpoint(pipe, path: str) -> None:
    """Write the pipeline's full state to ``path`` (.npz), atomically."""
    if hasattr(pipe, 'flush'):
        pipe.flush()
    arrays = _flatten_state(pipe.state)

    meta = {
        "frame": pipe.frame,
        "next_id": pipe._next_id,
        "timestamps": {str(k): v for k, v in pipe.timestamps.items()},
        "objects": {
            str(oid): {
                "ex_count": m.ex_count,
                "nonex_count": m.nonex_count,
                "class_probs": (m.class_probs.tolist()
                                if m.class_probs is not None else None),
                "pose_offsets": {str(f): o.tolist()
                                 for f, o in m.pose_offsets.items()},
            } for oid, m in pipe.meta.items()
        },
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)

    # trajectories
    if pipe.poses:
        frames = sorted(pipe.poses)
        arrays["traj.frames"] = np.asarray(frames, np.int64)
        arrays["traj.cam"] = np.stack([pipe.poses[f] for f in frames])
    for oid, traj in pipe.obj_poses.items():
        frames = sorted(traj)
        arrays[f"traj.obj{oid}.frames"] = np.asarray(frames, np.int64)
        arrays[f"traj.obj{oid}.poses"] = np.stack(
            [traj[f] for f in frames])

    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_checkpoint(pipe, path: str) -> None:
    """Restore pipeline state in place from ``path``.

    The pipeline must have been constructed with the same Params (shapes
    are validated against the stored arrays).
    """
    import jax.numpy as jnp
    from emfusion_tpu.pipeline import ObjectMeta

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}

    meta = json.loads(bytes(arrays.pop("__meta__").tobytes()).decode())

    state = pipe.state
    for name in ("bg_tsdf", "bg_weights", "bg_grads", "bg_pose", "bg_assoc",
                 "cam_pose"):
        cur = getattr(state, name)
        new = arrays[name]
        if tuple(cur.shape) != tuple(new.shape):
            raise ValueError(
                f"checkpoint shape mismatch for {name}: "
                f"{new.shape} vs {cur.shape} — params differ")
        state = state.replace(**{name: jnp.asarray(new, cur.dtype)})
    objs = state.objs
    for name in ("tsdf", "weights", "grads", "fg_counts", "pose",
                 "voxel_size", "truncdist", "active", "visible", "object_id",
                 "assoc"):
        objs = objs.replace(**{name: jnp.asarray(arrays[f"objs.{name}"])})
    # gradients may be stale on the sweep path (not maintained per frame)
    from emfusion_tpu.ops.fusion import compute_gradients
    state = state.replace(bg_grads=compute_gradients(
        state.bg_tsdf.astype(jnp.float32)))
    pipe.state = state.replace(objs=objs)

    pipe.frame = int(meta["frame"])
    pipe._next_id = int(meta["next_id"])
    pipe.timestamps = {int(k): float(v)
                       for k, v in meta.get("timestamps", {}).items()}
    pipe.meta = {}
    for oid, m in meta["objects"].items():
        om = ObjectMeta(
            ex_count=int(m["ex_count"]),
            nonex_count=int(m["nonex_count"]),
            class_probs=(np.asarray(m["class_probs"])
                         if m["class_probs"] is not None else None))
        om.pose_offsets = {int(f): np.asarray(o)
                           for f, o in m["pose_offsets"].items()}
        pipe.meta[int(oid)] = om

    pipe._poses = {}
    if "traj.frames" in arrays:
        for f, p in zip(arrays["traj.frames"], arrays["traj.cam"]):
            pipe._poses[int(f)] = p
    pipe._obj_poses = {}
    for k in arrays:
        if k.startswith("traj.obj") and k.endswith(".frames"):
            oid = int(k[len("traj.obj"):-len(".frames")])
            traj = {}
            for f, p in zip(arrays[k], arrays[f"traj.obj{oid}.poses"]):
                traj[int(f)] = p
            pipe._obj_poses[oid] = traj

    # host mirrors (active/ids/visible/poses) must match the restored
    # device state before the next process_frame
    pipe._refresh_host_mirrors()
