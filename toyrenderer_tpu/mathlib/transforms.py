"""Matrix / quaternion / frustum math.

Re-designed equivalents of the reference's DirectXMath-based helpers
(source/MathUtilities.cpp:3-38 patches projections for reverse-Z + infinite-Z;
source/Scene.cpp:109-145 builds view/projection/frustum per frame;
source/shaders/toyrenderer_common.hlsli has the adjugate normal transform).

Everything is written to work both on numpy arrays (host scene build) and
jnp arrays (inside jit), batched over leading dimensions where noted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize(v, axis=-1, eps=1e-20):
    """Safe normalize along `axis`."""
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return v / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# Projections
# ---------------------------------------------------------------------------

def perspective_reverse_z_infinite(yfov: float, aspect: float, znear: float):
    """Reverse-Z infinite-far perspective projection (column-vector, RH).

    Maps view space (x right, y up, looking down -Z) to clip space with
    ``z_ndc = znear / -z_view`` after perspective divide: depth == 1 at the
    near plane and -> 0 at infinity.  Mirrors the reference's patched
    projection (MathUtilities.cpp:3-38) without copying its row-vector
    DirectXMath layout.
    """
    f = 1.0 / np.tan(0.5 * yfov)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    # z' = znear, w' = -z  =>  depth = znear / -z   (reverse, infinite)
    m[2, 3] = znear
    m[3, 2] = -1.0
    return m


def look_at(eye, target, up):
    """Right-handed look-at view matrix (world -> view), column-vector."""
    eye = np.asarray(eye, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    up = np.asarray(up, dtype=np.float32)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = right
    m[1, :3] = true_up
    m[2, :3] = -fwd
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def view_from_rotation_translation(rot3, translation):
    """View matrix from a camera world rotation (3x3) and position."""
    rot3 = np.asarray(rot3, dtype=np.float32)
    translation = np.asarray(translation, dtype=np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = rot3.T
    m[:3, 3] = -rot3.T @ translation
    return m


# ---------------------------------------------------------------------------
# Quaternions (glTF order: x, y, z, w)
# ---------------------------------------------------------------------------

def quat_to_mat3(q):
    """Quaternion (..., 4) [x,y,z,w] -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_mul(a, b):
    """Hamilton product a*b, [x,y,z,w] layout, batched."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def compose_trs(translation, rotation_quat, scale):
    """TRS (..., 3), (..., 4), (..., 3) -> affine matrix (..., 4, 4)."""
    r = quat_to_mat3(rotation_quat)
    rs = r * scale[..., None, :]
    last_row = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rs.dtype),
        rs.shape[:-2] + (1, 4))
    top = jnp.concatenate([rs, translation[..., :, None]], axis=-1)
    return jnp.concatenate([top, last_row], axis=-2)


# ---------------------------------------------------------------------------
# Point / direction transforms
# ---------------------------------------------------------------------------

def transform_points(m, pts):
    """Apply (4,4) affine/projective matrix to (..., 3) points -> (..., 4)."""
    p = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    return p @ m.T


def transform_directions(m, dirs):
    """Apply the linear part of a (4,4) matrix to (..., 3) directions."""
    return dirs @ m[:3, :3].T


def adjugate3(m):
    """Adjugate of the upper-left 3x3 — the correct normal transform even for
    non-uniform scale (the reference uses the same trick,
    toyrenderer_common.hlsli 'adjugate'). Batched over leading dims."""
    a = m[..., :3, :3]
    # cofactor matrix rows: det(A) * A^{-T} row i = a_j x a_k (rows of A)
    c0 = jnp.cross(a[..., 1, :], a[..., 2, :])
    c1 = jnp.cross(a[..., 2, :], a[..., 0, :])
    c2 = jnp.cross(a[..., 0, :], a[..., 1, :])
    return jnp.stack([c0, c1, c2], axis=-2)


# ---------------------------------------------------------------------------
# Frusta
# ---------------------------------------------------------------------------

def frustum_planes_world(view_proj):
    """Extract 5 world-space frustum planes from a reverse-Z infinite
    view-projection matrix (Gribb-Hartmann).  Returns (5, 4) [nx,ny,nz,d]
    with inward-pointing normals: a point p is inside iff dot(n,p)+d >= 0
    for all planes.  Planes: left, right, bottom, top, near.
    (No far plane — infinite projection; reference derives its culling
    frustum similarly at BasePassRenderers.cpp:557-563.)
    """
    m = view_proj
    # numpy in -> numpy out: View.matrices() runs this on the HOST every
    # frame; a jnp formulation dispatched ~5 eager device ops per frame
    # (each a tunnel RPC under the remote-TPU backend — measured as real
    # device idle between frames)
    xp = np if isinstance(m, np.ndarray) else jnp
    rows = [
        m[3] + m[0],   # left
        m[3] - m[0],   # right
        m[3] + m[1],   # bottom
        m[3] - m[1],   # top
        m[2],          # near (reverse-Z: z' >= 0 at/inside near... z'>=0)
    ]
    planes = xp.stack(rows, axis=0)
    n = xp.linalg.norm(planes[:, :3], axis=-1, keepdims=True)
    return planes / xp.maximum(n, 1e-20)


def sphere_inside_frustum(planes, center, radius):
    """Batched sphere-vs-frustum test. planes (5,4), center (...,3),
    radius (...,). True == at least partially inside (conservative)."""
    d = jnp.einsum('pk,...k->...p', planes[:, :3], center) + planes[:, 3]
    return jnp.all(d >= -radius[..., None], axis=-1)


def aabb_transform(m, bmin, bmax):
    """Transform an AABB by an affine matrix; returns new (bmin, bmax)."""
    a = m[..., :3, :3]
    t = m[..., :3, 3]
    center = 0.5 * (bmin + bmax)
    extent = 0.5 * (bmax - bmin)
    new_center = jnp.einsum('...ij,...j->...i', a, center) + t
    new_extent = jnp.einsum('...ij,...j->...i', jnp.abs(a), extent)
    return new_center - new_extent, new_center + new_extent
