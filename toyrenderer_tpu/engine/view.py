"""Camera / View state (host side).

Counterpart of the reference's `View` (source/Scene.h:44-74,
source/Scene.cpp:109-145): per-frame jittered projection, previous-frame
matrices, freezeable culling matrices, WASD-style movement helpers.
Matrices are built on the host in numpy (tiny), then fed to the jitted
frame function as small arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from toyrenderer_tpu.mathlib import (
    halton_jitter_sequence, perspective_reverse_z_infinite,
)
from toyrenderer_tpu.mathlib.transforms import (
    frustum_planes_world, view_from_rotation_translation,
)

_JITTER_PHASES = 16


def _quat_to_mat3_np(q):
    q = q / np.linalg.norm(q)
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


@dataclass
class View:
    width: int
    height: int
    position: np.ndarray = field(
        default_factory=lambda: np.array([0.0, 1.0, 5.0], np.float32))
    rotation: np.ndarray = field(                      # quaternion xyzw
        default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    yfov: float = 1.0
    znear: float = 0.1
    enable_jitter: bool = True
    freeze_culling: bool = False                       # Scene.h:128 parity
    frame_index: int = 0

    _jitter: np.ndarray = field(
        default_factory=lambda: halton_jitter_sequence(_JITTER_PHASES))
    _prev: dict = field(default_factory=dict)
    _frozen: dict | None = None

    @classmethod
    def from_scene(cls, scene, width, height):
        return cls(width=width, height=height,
                   position=np.asarray(scene.camera_position, np.float32),
                   rotation=np.asarray(scene.camera_rotation, np.float32),
                   yfov=float(scene.camera_yfov),
                   znear=float(scene.camera_znear))

    def matrices(self) -> dict:
        """Per-frame matrix bundle (numpy f32).  Call once per frame, then
        `advance()` after rendering."""
        aspect = self.width / self.height
        proj = perspective_reverse_z_infinite(self.yfov, aspect, self.znear)
        jitter = (self._jitter[self.frame_index % _JITTER_PHASES]
                  if self.enable_jitter else np.zeros(2, np.float32))
        proj_j = proj.copy()
        # sub-pixel offset in NDC units added post-projection
        proj_j[0, :] += proj[3, :] * (2.0 * jitter[0] / self.width)
        proj_j[1, :] += proj[3, :] * (-2.0 * jitter[1] / self.height)

        rot3 = _quat_to_mat3_np(self.rotation)
        view = view_from_rotation_translation(rot3, self.position)
        vp = proj_j @ view
        vp_nojit = proj @ view
        cur = dict(
            view=view,
            view_proj=vp.astype(np.float32),
            view_proj_nojitter=vp_nojit.astype(np.float32),
            inv_view_proj=np.linalg.inv(vp_nojit).astype(np.float32),
            cam_pos=self.position.astype(np.float32),
            jitter=jitter.astype(np.float32),
        )
        cur['prev_view_proj_nojitter'] = self._prev.get(
            'view_proj_nojitter', cur['view_proj_nojitter'])
        if self.freeze_culling and self._frozen is not None:
            cur['cull_view_proj'] = self._frozen['view_proj_nojitter']
            cur['cull_cam_pos'] = self._frozen['cam_pos']
        else:
            cur['cull_view_proj'] = cur['view_proj_nojitter']
            cur['cull_cam_pos'] = cur['cam_pos']
            self._frozen = dict(view_proj_nojitter=cur['view_proj_nojitter'],
                                cam_pos=cur['cam_pos'])
        cur['cull_frustum_planes'] = np.asarray(
            frustum_planes_world(cur['cull_view_proj']), np.float32)
        # pixels per world unit at unit distance (screen-error LOD select)
        cur['proj_scale_px'] = np.float32(proj[1, 1] * self.height * 0.5)
        return cur

    def advance(self, matrices: dict):
        self._prev = dict(
            view_proj_nojitter=matrices['view_proj_nojitter'])
        self.frame_index += 1

    # -- fly-camera controls (Scene.cpp:215-280 parity, headless-driven) ---
    def move(self, forward=0.0, right=0.0, up=0.0):
        rot3 = _quat_to_mat3_np(self.rotation)
        self.position = (self.position
                         - rot3[:, 2] * forward
                         + rot3[:, 0] * right
                         + np.array([0, 1, 0], np.float32) * up)

    def rotate_yaw_pitch(self, yaw: float, pitch: float):
        cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
        cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
        qy = np.array([0, sy, 0, cy], np.float32)       # yaw about world Y
        qp = np.array([sp, 0, 0, cp], np.float32)       # pitch about local X
        self.rotation = _quat_mul_np(qy, _quat_mul_np(self.rotation, qp))


def _quat_mul_np(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz], np.float32)
