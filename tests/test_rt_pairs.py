"""rt_pairs (pair-MXU traversal) vs the lockstep oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toyrenderer_tpu.ops.bvh import build_bvh, traverse
from toyrenderer_tpu.ops.rt_pairs import mt_tables, traverse_pairs


def _random_scene(n_tris=700, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-4, 4, (n_tris, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.normal(0, 0.7, (n_tris, 3)).astype(np.float32)
    v2 = base + rng.normal(0, 0.7, (n_tris, 3)).astype(np.float32)
    return jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)


def _rays(n, seed=11, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("any_hit", [False, True])
@pytest.mark.parametrize("precision", ["high", "highest"])
def test_matches_oracle(any_hit, precision):
    v0, v1, v2 = _random_scene()
    bvh = build_bvh(v0, v1, v2, jnp.ones(v0.shape[0], bool))
    o, d = _rays(640)
    ref = traverse(bvh, o, d, t_max=100.0, any_hit=False)
    got = traverse_pairs(bvh, o, d, t_max=100.0, any_hit=any_hit,
                         precision=precision, interpret=True)
    hr = np.asarray(ref["hit"])
    hg = np.asarray(got["hit"])
    np.testing.assert_array_equal(hg, hr)
    both = hr & hg
    # bf16x3 ('high') carries ~2^-16 product error through MT's
    # cancellation-amplified forms; 'highest' is f32-grade
    tol = 2e-3 if precision == "high" else 2e-4
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(ref["t"])[both],
                               rtol=tol, atol=tol)
    # same winning triangle up to t-ties
    tr = np.asarray(ref["tri"])[both]
    tg = np.asarray(got["tri"])[both]
    agree = (tr == tg).mean()
    assert agree > 0.98, agree


def test_live_mask_and_tmax():
    v0, v1, v2 = _random_scene(300, seed=5)
    bvh = build_bvh(v0, v1, v2, jnp.ones(v0.shape[0], bool))
    o, d = _rays(256, seed=7)
    live = jnp.asarray((np.arange(256) % 3 == 0).astype(np.float32))
    got = traverse_pairs(bvh, o, d, t_max=2.5, live=live,
                         interpret=True)
    ref = traverse(bvh, o, d, t_max=2.5, any_hit=False)
    hr = np.asarray(ref["hit"]) & (np.asarray(live) > 0)
    np.testing.assert_array_equal(np.asarray(got["hit"]), hr)
    assert np.all(np.asarray(got["t"])[~hr] == 2.5)


def test_overflow_fallback_exact():
    # tiny pair capacity forces overflow; fallback must keep it exact
    v0, v1, v2 = _random_scene(900, seed=9)
    bvh = build_bvh(v0, v1, v2, jnp.ones(v0.shape[0], bool))
    o, d = _rays(512, seed=13, spread=3.0)
    ref = traverse(bvh, o, d, t_max=100.0, any_hit=False)
    got = traverse_pairs(bvh, o, d, t_max=100.0, pair_factor=1,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got["hit"]),
                                  np.asarray(ref["hit"]))
    both = np.asarray(ref["hit"])
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(ref["t"])[both],
                               rtol=2e-4, atol=2e-4)


def test_tables_cacheable():
    v0, v1, v2 = _random_scene(200, seed=21)
    bvh = build_bvh(v0, v1, v2, jnp.ones(v0.shape[0], bool))
    tables = jax.jit(mt_tables)(bvh)
    o, d = _rays(128, seed=23)
    a = traverse_pairs(bvh, o, d, t_max=50.0, tables=tables,
                       interpret=True)
    b = traverse_pairs(bvh, o, d, t_max=50.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(a["hit"]),
                                  np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               rtol=1e-6)
