"""Block-pair chunk traversal (ops/rt_chunks.py) vs brute-force oracles.

The fetch path quantizes triangle data to a hi/lo bf16 pair (exact for
values with <= ~16 mantissa bits), so the exact-match tests snap
vertices to a 1/256 grid — the fetch then reproduces f32 bit-exactly
and results must EQUAL the oracle; a separate unsnapped test bounds the
general-precision behavior.
"""

import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu.ops import bvh as B
from toyrenderer_tpu.ops.rt_chunks import chunk_table, traverse_chunks
from tests.test_bvh import _brute_force, _random_tris


def _snap(x):
    return np.round(np.asarray(x) * 256.0) / 256.0


def _rays(n_rays, seed=2, spread=12.0):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-spread, spread,
                          size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return origins, dirs


def test_chunks_matches_bruteforce_exact():
    v0, v1, v2 = _random_tris(700, seed=5)
    # snap so v0/e1/e2 are exact under the hi/lo bf16 fetch
    v0, v1, v2 = _snap(v0), _snap(v1), _snap(v2)
    valid = np.ones(700, bool)
    origins, dirs = _rays(256)
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))
    got = traverse_chunks(bvh, jnp.asarray(origins), jnp.asarray(dirs),
                       t_max=100.0)
    t_want, tri_want = _brute_force(v0.astype(np.float32),
                                    v1.astype(np.float32),
                                    v2.astype(np.float32),
                                    valid, origins, dirs, 100.0)
    hit_want = tri_want >= 0
    assert np.array_equal(np.asarray(got['hit']), hit_want)
    assert np.allclose(np.asarray(got['t'])[hit_want],
                       t_want[hit_want], rtol=1e-6, atol=1e-6)
    assert np.array_equal(np.asarray(got['tri'])[hit_want],
                          tri_want[hit_want])


def test_chunks_overflow_fallback_exact():
    """A tiny pair capacity forces the overflow fallback; the merged
    result stays exact."""
    v0, v1, v2 = _random_tris(500, seed=7)
    v0, v1, v2 = _snap(v0), _snap(v1), _snap(v2)
    valid = np.ones(500, bool)
    origins, dirs = _rays(128, seed=9)
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))
    got = traverse_chunks(bvh, jnp.asarray(origins), jnp.asarray(dirs),
                       t_max=100.0, pair_factor=1)
    t_want, tri_want = _brute_force(v0.astype(np.float32),
                                    v1.astype(np.float32),
                                    v2.astype(np.float32),
                                    valid, origins, dirs, 100.0)
    hit_want = tri_want >= 0
    assert np.array_equal(np.asarray(got['hit']), hit_want)
    assert np.array_equal(np.asarray(got['tri'])[hit_want],
                          tri_want[hit_want])


def test_chunks_any_hit_live_tmax():
    v0, v1, v2 = _random_tris(400, seed=11)
    v0, v1, v2 = _snap(v0), _snap(v1), _snap(v2)
    valid = np.ones(400, bool)
    origins, dirs = _rays(128, seed=13)
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))
    t_want, tri_want = _brute_force(v0.astype(np.float32),
                                    v1.astype(np.float32),
                                    v2.astype(np.float32),
                                    valid, origins, dirs, 100.0)
    hit_want = tri_want >= 0

    ga = traverse_chunks(bvh, jnp.asarray(origins), jnp.asarray(dirs),
                      t_max=100.0, any_hit=True)
    assert np.array_equal(np.asarray(ga['hit']), hit_want)

    # t_max clips hits beyond it
    t_small = 5.0
    gs = traverse_chunks(bvh, jnp.asarray(origins), jnp.asarray(dirs),
                      t_max=t_small)
    want_close = hit_want & (t_want < t_small)
    assert np.array_equal(np.asarray(gs['hit']), want_close)

    # dead rays report miss
    lv = np.zeros(128, np.float32)
    lv[::2] = 1.0
    gl = traverse_chunks(bvh, jnp.asarray(origins), jnp.asarray(dirs),
                      t_max=100.0, live=jnp.asarray(lv))
    got_hit = np.asarray(gl['hit'])
    assert not got_hit[1::2].any()
    assert np.array_equal(got_hit[::2], hit_want[::2])


def test_chunks_unsnapped_precision_bound():
    """Raw f32 vertices: the ~2^-17 fetch error may flip knife-edge
    cases, but hit/miss parity must hold for ~all rays and t errors
    stay small."""
    v0, v1, v2 = _random_tris(600, seed=17)
    valid = np.ones(600, bool)
    origins, dirs = _rays(512, seed=19)
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))
    got = traverse_chunks(bvh, jnp.asarray(origins), jnp.asarray(dirs),
                       t_max=100.0)
    t_want, tri_want = _brute_force(v0, v1, v2, valid, origins, dirs,
                                    100.0)
    hit_want = tri_want >= 0
    agree = np.asarray(got['hit']) == hit_want
    assert agree.mean() > 0.99
    both = agree & hit_want
    terr = np.abs(np.asarray(got['t'])[both] - t_want[both])
    rel = terr / np.maximum(t_want[both], 1e-3)
    assert np.percentile(rel, 99) < 1e-3


def test_chunk_table_padding():
    """Leaf counts not a multiple of CHUNK_ROWS pad with dead slots."""
    v0, v1, v2 = _random_tris(100, seed=23)
    valid = np.ones(100, bool)
    bvh = B.build_bvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(valid))
    boxes, data = chunk_table(bvh)
    assert boxes.shape[0] == data.shape[0]
    # every payload of a padded slot is -1; real payloads >= 0 somewhere
    from toyrenderer_tpu.ops.rt_chunks import CHUNK_TRIS
    pay = np.asarray(data).reshape(-1, 10, CHUNK_TRIS)[:, 9]
    assert (pay >= -1).all()
    assert (pay >= 0).any()
    # boxes contain their triangles
    m = np.asarray(data).reshape(-1, 10, CHUNK_TRIS)
    v0c, e1c, e2c = m[:, 0:3], m[:, 3:6], m[:, 6:9]
    ok = pay >= 0
    for c in range(m.shape[0]):
        for t in range(CHUNK_TRIS):
            if not ok[c, t]:
                continue
            p0 = v0c[c, :, t]
            p1 = p0 + e1c[c, :, t]
            p2 = p0 + e2c[c, :, t]
            lo, hi = np.asarray(boxes[c, 0:3]), np.asarray(boxes[c, 3:6])
            for p in (p0, p1, p2):
                assert (p >= lo - 1e-4).all() and (p <= hi + 1e-4).all()
