"""Math unit tests: projections, quaternions, frusta (vs numpy oracles)."""

import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu import mathlib as M


def test_reverse_z_infinite_depths():
    p = M.perspective_reverse_z_infinite(np.radians(60), 16 / 9, 0.1)
    def depth(z_view):
        v = p @ np.array([0, 0, z_view, 1], np.float32)
        return v[2] / v[3]
    assert abs(depth(-0.1) - 1.0) < 1e-6          # near plane -> 1
    assert abs(depth(-1e6)) < 1e-5                # infinity -> 0
    assert depth(-1.0) > depth(-10.0)             # reverse: closer = larger


def test_projection_fov():
    fov = np.radians(90)
    p = M.perspective_reverse_z_infinite(fov, 1.0, 0.1)
    # point on the fov edge: x = -z * tan(fov/2) maps to clip x == w
    z = -5.0
    v = p @ np.array([-z * np.tan(fov / 2), 0, z, 1], np.float32)
    assert abs(v[0] / v[3] - 1.0) < 1e-6


def test_look_at_identity():
    v = M.look_at([0, 0, 0], [0, 0, -1], [0, 1, 0])
    np.testing.assert_allclose(v, np.eye(4), atol=1e-7)


def test_look_at_transforms_target_to_minus_z():
    v = M.look_at([1, 2, 3], [4, 5, 6], [0, 1, 0])
    t = v @ np.array([4, 5, 6, 1], np.float32)
    assert abs(t[0]) < 1e-5 and abs(t[1]) < 1e-5 and t[2] < 0


def test_quat_to_mat3_vs_rotate():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(100, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(100, 3)).astype(np.float32)
    r1 = np.einsum('nij,nj->ni', np.asarray(M.quat_to_mat3(jnp.asarray(q))), v)
    r2 = np.asarray(M.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(r1, r2, atol=1e-4)


def test_quat_90deg_z():
    s = np.sin(np.pi / 4); c = np.cos(np.pi / 4)
    q = jnp.asarray([0.0, 0.0, s, c])  # 90 deg about +Z
    r = np.asarray(M.quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0])))
    np.testing.assert_allclose(r, [0, 1, 0], atol=1e-6)


def test_compose_trs():
    t = jnp.asarray([1.0, 2.0, 3.0])
    s = np.sin(np.pi / 4); c = np.cos(np.pi / 4)
    q = jnp.asarray([0.0, 0.0, s, c])
    sc = jnp.asarray([2.0, 2.0, 2.0])
    m = np.asarray(M.compose_trs(t, q, sc))
    p = m @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(p[:3], [1, 4, 3], atol=1e-5)


def test_adjugate_normal_transform():
    # non-uniform scale: normals must use adjugate, not the matrix itself
    m = jnp.asarray(np.diag([2.0, 1.0, 1.0, 1.0]).astype(np.float32))
    n = jnp.asarray([1.0, 1.0, 0.0]) / np.sqrt(2)
    adj = M.adjugate3(m)
    out = np.array(adj @ n)
    out /= np.linalg.norm(out)
    # plane x+2y=const under scale x'=2x: normal (1,2,0)/sqrt5... verify
    # original plane: x + y = c, points (1,-1,0)*t stay on it; scaled plane
    # x/2 + y = c -> normal (0.5,1,0) ~ (1,2,0)/sqrt5
    np.testing.assert_allclose(out, np.array([1, 2, 0]) / np.sqrt(5), atol=1e-6)


def test_frustum_contains_points():
    p = M.perspective_reverse_z_infinite(np.radians(60), 1.0, 0.1)
    v = M.look_at([0, 0, 0], [0, 0, -1], [0, 1, 0])
    planes = M.frustum_planes_world(jnp.asarray(p @ v))
    from toyrenderer_tpu.mathlib.transforms import sphere_inside_frustum
    centers = jnp.asarray([
        [0, 0, -5.0],    # inside
        [0, 0, 5.0],     # behind camera
        [100, 0, -5.0],  # far outside fov
        [0, 0, -1e7],    # very far: infinite projection -> still inside
    ])
    radii = jnp.asarray([0.1, 0.1, 0.1, 0.1])
    inside = np.asarray(sphere_inside_frustum(planes, centers, radii))
    assert inside.tolist() == [True, False, False, True]


def test_frustum_conservative_radius():
    p = M.perspective_reverse_z_infinite(np.radians(60), 1.0, 0.1)
    v = M.look_at([0, 0, 0], [0, 0, -1], [0, 1, 0])
    planes = M.frustum_planes_world(jnp.asarray(p @ v))
    from toyrenderer_tpu.mathlib.transforms import sphere_inside_frustum
    # sphere centered far outside but big enough to poke into the frustum
    c = jnp.asarray([[20.0, 0.0, -5.0]])
    assert bool(sphere_inside_frustum(planes, c, jnp.asarray([30.0]))[0])
    assert not bool(sphere_inside_frustum(planes, c, jnp.asarray([1.0]))[0])


def test_aabb_transform():
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [10, 0, 0]
    m[0, 0] = 2.0
    bmin, bmax = M.aabb_transform(jnp.asarray(m),
                                  jnp.asarray([-1.0, -1, -1]),
                                  jnp.asarray([1.0, 1, 1]))
    np.testing.assert_allclose(np.asarray(bmin), [8, -1, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bmax), [12, 1, 1], atol=1e-6)


def test_halton_first_values():
    from toyrenderer_tpu.mathlib import halton
    np.testing.assert_allclose(halton(np.array([1, 2, 3, 4]), 2),
                               [0.5, 0.25, 0.75, 0.125], atol=1e-7)
    np.testing.assert_allclose(halton(np.array([1, 2, 3]), 3),
                               [1 / 3, 2 / 3, 1 / 9], atol=1e-7)


def test_halton_jitter_range():
    from toyrenderer_tpu.mathlib import halton_jitter_sequence
    j = halton_jitter_sequence(16)
    assert j.shape == (16, 2)
    assert j.min() >= -0.5 and j.max() < 0.5
