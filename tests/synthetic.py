"""Analytic synthetic RGB-D scene renderer for integration tests.

Scene: floor plane + static background sphere + one movable "object"
sphere. Depth is exact ray-geometry intersection; the object mask is the
object sphere's silhouette (nearest-surface test included).
"""

from __future__ import annotations

import numpy as np


class SyntheticScene:
    def __init__(self, H=120, W=160, f=120.0,
                 floor_y=0.4,
                 bg_spheres=((np.array([-0.25, 0.0, 1.3]), 0.3),
                             (np.array([0.3, -0.25, 1.5]), 0.2)),
                 obj_sphere_r=0.12):
        self.H, self.W, self.f = H, W, f
        self.cx, self.cy = W / 2 - 0.5, H / 2 - 0.5
        self.floor_y = floor_y
        # two bg spheres + floor pin all 6 DoF (one sphere + floor leaves a
        # rotational gauge mode that makes tracking tests drift)
        self.bg_spheres = bg_spheres
        self.obj_r = obj_sphere_r

    @property
    def intr(self):
        return np.array([[self.f, 0, self.cx], [0, self.f, self.cy],
                         [0, 0, 1]], np.float32)

    def _rays(self, cam_pose):
        Tinv = np.linalg.inv(cam_pose)
        ys, xs = np.mgrid[0:self.H, 0:self.W]
        d = np.stack([(xs - self.cx) / self.f, (ys - self.cy) / self.f,
                      np.ones_like(xs, np.float64)], -1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return d, Tinv

    def _sphere_t(self, dirs, center_c, r):
        b = -2 * (dirs @ center_c)
        c = center_c @ center_c - r * r
        disc = b * b - 4 * c
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2,
                     np.inf)
        return np.where(t > 0, t, np.inf)

    def render(self, cam_pose, obj_center_w):
        """Returns (depth (H,W) float32, obj_mask (H,W) bool)."""
        dirs, Tinv = self._rays(cam_pose)
        R, t = Tinv[:3, :3], Tinv[:3, 3]

        t_bg = np.full((self.H, self.W), np.inf)
        for c_w, r in self.bg_spheres:
            t_bg = np.minimum(t_bg, self._sphere_t(dirs, R @ c_w + t, r))
        t_obj = self._sphere_t(dirs, R @ np.asarray(obj_center_w) + t,
                               self.obj_r)
        # floor plane y = floor_y (world)
        n_c = R @ np.array([0, 1.0, 0])
        p0_c = R @ np.array([0, self.floor_y, 0]) + t
        denom = dirs @ n_c
        t_pl = np.where(np.abs(denom) > 1e-9, (p0_c @ n_c) / denom, np.inf)
        t_pl = np.where(t_pl > 0, t_pl, np.inf)

        t_best = np.minimum(np.minimum(t_bg, t_obj), t_pl)
        depth = np.where(np.isfinite(t_best), t_best * dirs[..., 2], 0.0)
        depth = np.where(depth > 4.0, 0.0, depth).astype(np.float32)
        obj_mask = (t_obj <= t_best) & np.isfinite(t_obj)
        return depth, obj_mask
