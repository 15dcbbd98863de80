"""Offline visualization: detection overlays and turntable 3-D renders.

Equivalents of the reference's two interactive visualization features on
a headless TPU host:

  * :func:`visualize_detections` — ``MaskRCNN::visualize``
    (``src/core/MaskRCNN.cpp:284-323``): per-instance color fill blended
    50/50 with the RGB frame, instance bounding boxes and
    "class: score" labels.
  * :func:`render_turntable` — the cv::viz 3-D window
    (``src/core/EMFusion.cpp:162-233``): instead of an interactive
    viewer, renders the fused model from a camera orbit by raycasting
    the volumes from virtual viewpoints (Phong, object id colors),
    overlaying per-object volume bounding boxes and a camera frustum
    widget — written as PNG frames / an animation by the caller.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from emfusion_tpu.ops.render import make_colormap
from emfusion_tpu import segmentation as seg_mod

_CMAP = make_colormap()


def _instance_color(i: int) -> np.ndarray:
    return _CMAP[(i % 255) + 1]


def _mask_bbox(mask: np.ndarray) -> Optional[np.ndarray]:
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    return np.array([ys.min(), xs.min(), ys.max(), xs.max()])


def visualize_detections(rgb: Optional[np.ndarray],
                         dets: Sequence[seg_mod.Detection]) -> np.ndarray:
    """Overlay instance masks/boxes/labels on ``rgb`` (H, W, 3 uint8).

    ``rgb`` may be None (e.g. depth-only datasets): a black canvas of
    the first mask's shape is used.
    """
    from PIL import Image, ImageDraw

    if rgb is None:
        if not dets:
            return np.zeros((1, 1, 3), np.uint8)
        h, w = dets[0].mask.shape
        rgb = np.zeros((h, w, 3), np.uint8)
    vis = rgb.astype(np.float32).copy()
    for i, d in enumerate(dets):
        color = _instance_color(i).astype(np.float32)
        m = d.mask.astype(bool)
        vis[m] = 0.5 * vis[m] + 0.5 * color[None, :]

    img = Image.fromarray(vis.astype(np.uint8))
    draw = ImageDraw.Draw(img)
    for i, d in enumerate(dets):
        box = d.box
        if box is None:
            box = _mask_bbox(d.mask)
        if box is None:
            continue
        y1, x1, y2, x2 = [int(v) for v in box]
        color = tuple(int(c) for c in _instance_color(i))
        draw.rectangle([x1, y1, x2, y2], outline=color, width=1)
        cid = d.class_id
        label = f"{seg_mod.class_name(cid)}: {float(d.scores[cid]):.2f}"
        draw.text((x1, max(0, y1 - 11)), label, fill=(0, 255, 255))
    return np.asarray(img)


# ---------------------------------------------------------------------
# turntable rendering
# ---------------------------------------------------------------------

def _look_at(eye: np.ndarray, target: np.ndarray,
             up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """World-from-camera pose whose +z axis looks from eye at target."""
    z = target - eye
    z = z / np.linalg.norm(z)
    up = np.asarray(up, np.float32)
    x = np.cross(up, z)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0], np.float32)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = x, y, z, eye
    return pose


def _project(pts_w: np.ndarray, cam_pose: np.ndarray, intr: np.ndarray):
    """World points (N, 3) -> pixel coords (N, 2) + in-front mask."""
    T = np.linalg.inv(cam_pose)
    pc = pts_w @ T[:3, :3].T + T[:3, 3]
    z = pc[:, 2]
    ok = z > 1e-6
    zs = np.where(ok, z, 1.0)
    u = pc[:, 0] / zs * intr[0, 0] + intr[0, 2]
    v = pc[:, 1] / zs * intr[1, 1] + intr[1, 2]
    return np.stack([u, v], axis=1), ok


_BOX_EDGES = [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6),
              (3, 7), (4, 5), (4, 6), (5, 7), (6, 7)]


def _draw_lines(draw, pts2d, ok, edges, color):
    for a, b in edges:
        if ok[a] and ok[b]:
            draw.line([tuple(pts2d[a]), tuple(pts2d[b])], fill=color,
                      width=1)


def render_orbit_view(pipe, yaw: float, pitch: float = -0.25,
                      radius: Optional[float] = None,
                      with_widgets: bool = True) -> np.ndarray:
    """Render the current fused model from one virtual orbit camera.

    ``yaw`` in radians around the volume center; ``pitch`` is the
    eye-height fraction of the radius (negative = above). Uses the
    pipeline's own raycast+Phong programs (the scene is untouched);
    overlays object volume bounding boxes and the real camera's
    frustum, like the reference's 3-D window widgets
    (``EMFusion.cpp:162-233``). Returns an (H, W, 3) uint8 frame.
    """
    from PIL import Image, ImageDraw
    import jax.numpy as jnp
    from emfusion_tpu.ops.render import render_phong

    p = pipe.params
    center = np.asarray(pipe.state.bg_pose)[:3, 3]
    if radius is None:
        ext = max(p.globalVolumeDims) * p.globalVoxelSize
        radius = 1.1 * ext
    slots = jnp.asarray(np.nonzero(pipe._h_active)[0], np.int32)
    intr = np.asarray(pipe.params.intr)

    eye = center + radius * np.array(
        [np.sin(yaw), pitch, np.cos(yaw)], np.float32)
    pose = _look_at(eye.astype(np.float32), center.astype(np.float32))
    state_v = pipe.state.replace(cam_pose=jnp.asarray(pose))
    _, rc = pipe._raycast_subset(state_v, slots,
                                 bg_axis=pipe._bg_scan_axis())
    img = render_phong(rc["vertices"], rc["normals"], rc["seg"],
                       jnp.asarray(pipe.colormap))
    img = np.asarray(img).astype(np.uint8)

    if with_widgets:
        pil = Image.fromarray(img)
        draw = ImageDraw.Draw(pil)
        # object volume bounding boxes (world-frame cubes)
        obj_pose = np.asarray(pipe.state.objs.pose)
        obj_vs = np.asarray(pipe.state.objs.voxel_size)
        for k in np.nonzero(pipe._h_active)[0]:
            half = (pipe.obj_res - 1) * float(obj_vs[k]) / 2
            corners_o = np.array(
                [[sx * half, sy * half, sz * half]
                 for sz in (-1, 1) for sy in (-1, 1)
                 for sx in (-1, 1)], np.float32)
            T = obj_pose[k]
            corners_w = corners_o @ T[:3, :3].T + T[:3, 3]
            pts2d, ok = _project(corners_w, pose, intr)
            oid = int(pipe._h_ids[k])
            color = tuple(int(c) for c in pipe.colormap[oid % 256])
            _draw_lines(draw, pts2d, ok, _BOX_EDGES, color)
        # camera frustum widget at the real camera pose
        cam = pipe._h_cam_pose
        zf = 0.25
        fr = np.array([[0, 0, 0],
                       [-zf, -zf * 0.75, zf], [zf, -zf * 0.75, zf],
                       [-zf, zf * 0.75, zf], [zf, zf * 0.75, zf]],
                      np.float32)
        fr_w = fr @ cam[:3, :3].T + cam[:3, 3]
        pts2d, ok = _project(fr_w, pose, intr)
        edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 4),
                 (4, 3), (3, 1)]
        _draw_lines(draw, pts2d, ok, edges, (255, 255, 0))
        img = np.asarray(pil)
    return img


def render_turntable(pipe, n_views: int = 12,
                     radius: Optional[float] = None,
                     with_widgets: bool = True) -> List[np.ndarray]:
    """Render the current fused model from a horizontal camera orbit
    (``render_orbit_view`` at n evenly spaced yaws)."""
    return [render_orbit_view(pipe, 2 * np.pi * i / n_views,
                              radius=radius, with_widgets=with_widgets)
            for i in range(n_views)]


def save_frames(frames: Sequence[np.ndarray], path_pattern: str) -> None:
    """Write frames as PNGs (``path_pattern % index``)."""
    from PIL import Image
    for i, f in enumerate(frames):
        Image.fromarray(f).save(path_pattern % i)
