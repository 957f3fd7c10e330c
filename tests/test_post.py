"""HDR post-pipeline tests: exposure histogram/adaptation, bloom, TAA,
tonemap."""

import jax
import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu.ops import exposure as E
from toyrenderer_tpu.ops import bloom as B
from toyrenderer_tpu.ops import taa as T
from toyrenderer_tpu.ops.postprocess import tonemap_pbr_neutral, compose_final


# --- exposure ---------------------------------------------------------------

def test_histogram_total_and_black_bin():
    img = np.zeros((16, 16, 3), np.float32)
    img[:8] = 0.5
    hist = np.asarray(E.luminance_histogram(jnp.asarray(img)))
    assert hist.sum() == 256
    assert hist[0] == 128          # black half goes to bin 0


def test_histogram_oracle_uniform():
    lum = 0.5
    img = np.full((8, 8, 3), lum, np.float32)
    hist = np.asarray(E.luminance_histogram(jnp.asarray(img)))
    expected_bin = int(np.clip(
        (np.log2(lum) - E.MIN_LOG_LUM) / E.LOG_LUM_RANGE, 0, 1)
        * (E.NUM_BINS - 2) + 1.5)
    assert hist[expected_bin] == 64


def test_average_log_luminance():
    img = np.full((8, 8, 3), 2.0, np.float32)   # log2 lum = 1
    hist = E.luminance_histogram(jnp.asarray(img))
    avg = float(E.average_log_luminance(hist))
    assert abs(avg - 1.0) < 0.1


def test_exposure_adapts_toward_target():
    bright = jnp.full((8, 8, 3), 10.0)
    exp0 = jnp.asarray(1.0)
    e1, aux = E.adapt_exposure(bright, exp0, dt=1 / 60)
    # brighter scene -> target below current exposure -> decrease
    assert float(aux['target_exposure']) < 1.0
    assert float(aux['target_exposure']) < float(e1) < 1.0
    # converges monotonically
    e = exp0
    for _ in range(200):
        e, _ = E.adapt_exposure(bright, e, dt=1 / 10)
    assert abs(float(e) - float(aux['target_exposure'])) < 1e-2


# --- bloom -------------------------------------------------------------------

def test_downsample_preserves_flat_field():
    img = jnp.full((3, 32, 64), 3.0)    # planar (C, H, W)
    d = B.downsample_13tap(img)
    assert d.shape == (3, 16, 32)
    np.testing.assert_allclose(np.asarray(d), 3.0, rtol=1e-6)
    dk = B.downsample_13tap(img, karis=True)
    np.testing.assert_allclose(np.asarray(dk), 3.0, rtol=1e-5)


def test_bloom_spreads_bright_spot():
    img = np.zeros((64, 64, 3), np.float32)
    img[32, 32] = 100.0
    out = np.asarray(B.bloom(jnp.asarray(img), num_mips=4))
    assert out.shape == img.shape
    # energy spreads: neighbors far from the spot receive light
    assert out[32, 40].sum() > 0.001
    assert out[32, 32].sum() < img[32, 32].sum() * 3
    # flat black stays black-ish far away
    assert out[2, 2].sum() < out[32, 36].sum()


def test_upsample_tent_shape():
    img = jnp.ones((3, 9, 17))          # planar (C, H, W)
    up = B.upsample_tent(img, 18, 34)
    assert up.shape == (3, 18, 34)
    np.testing.assert_allclose(np.asarray(up), 1.0, rtol=1e-5)


# --- TAA ----------------------------------------------------------------------

def test_taa_first_frame_passthrough():
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    hist = jnp.zeros((16, 16, 3))
    out, new_hist = T.taa_resolve(color, jnp.zeros((16, 16, 2)), hist,
                                  history_valid=jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(color), atol=1e-6)


def test_taa_converges_static():
    rng = np.random.default_rng(1)
    # smooth clean signal (a gradient) so variance clipping doesn't bias
    gy, gx = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16),
                         indexing='ij')
    clean = np.stack([gx, gy, 0.5 * (gx + gy)], -1).astype(np.float32)
    hist = jnp.zeros((16, 16, 3))
    valid = jnp.asarray(0.0)
    motion = jnp.zeros((16, 16, 2))
    outs = []
    for i in range(20):
        noisy = jnp.asarray(clean + rng.normal(
            scale=0.05, size=clean.shape).astype(np.float32))
        out, hist = T.taa_resolve(noisy, motion, hist, valid)
        valid = jnp.asarray(1.0)
        outs.append(np.asarray(out))
    # accumulated output is closer to clean than a single noisy frame
    err_final = np.abs(outs[-1] - clean).mean()
    err_first = np.abs(outs[0] - clean).mean()
    assert err_final < err_first * 0.7


def test_bilinear_sampler():
    img = np.zeros((8, 8, 3), np.float32)
    img[:, 4] = 1.0
    y = jnp.asarray([[4.0]])
    for x, want in [(4.0, 1.0), (3.5, 0.5), (4.5, 0.5), (6.0, 0.0)]:
        got = float(T._sample_bilinear(
            jnp.asarray(img), y, jnp.asarray([[x]]))[0, 0, 0])
        assert abs(got - want) < 1e-6, (x, got, want)


def test_taa_flat_neighborhood_rejects_history():
    """sigma == 0 neighborhoods must clamp stale history to the current
    color (prevents ghosting onto flat regions)."""
    hist = np.ones((8, 8, 3), np.float32)
    color = jnp.zeros((8, 8, 3))
    out, _ = T.taa_resolve(color, jnp.zeros((8, 8, 2)), jnp.asarray(hist),
                           history_valid=jnp.asarray(1.0))
    assert float(np.abs(np.asarray(out)).max()) < 1e-6


def test_adapt_exposure_matches_histogram_mean():
    """The direct masked-mean path must equal the histogram-weighted
    mean it replaced (same avg_log -> same target exposure)."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0.0, 4.0, size=(32, 32, 3)).astype(np.float32)
    img[:4] = 0.0                          # some true-black rows
    hdr = jnp.asarray(img)
    hist = E.luminance_histogram(hdr)
    want_log = float(E.average_log_luminance(hist))
    _, aux = E.adapt_exposure(hdr, jnp.asarray(1.0))
    got_log = float(jnp.log2(aux['avg_luminance']))
    assert abs(got_log - want_log) < 1e-4


def test_warp_pallas_halfres_mapping_matches_gather():
    """The denoiser's half-res warp mapping (pooled motion * 0.5 against
    an integer half-res grid) must equal the XLA half-res gather it
    replaces (interpret mode)."""
    from toyrenderer_tpu.ops.warp_pallas import warp_bilinear
    rng = np.random.default_rng(11)
    h, w = 64, 768                       # full-res dims, even
    hist = rng.uniform(size=(h // 2, w // 2, 2)).astype(np.float32)
    mot = rng.uniform(-9.0, 9.0, size=(h, w, 2)).astype(np.float32)

    def avgpool(a):
        return jax.lax.reduce_window(jnp.asarray(a), 0.0, jax.lax.add,
                                     (2, 2), (2, 2), 'VALID') * 0.25
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    prev_y = py - mot[..., 1] - 0.5
    prev_x = px - mot[..., 0] - 0.5
    ref = T._sample_bilinear(jnp.asarray(hist),
                             (avgpool(prev_y) - 0.5) * 0.5,
                             (avgpool(prev_x) - 0.5) * 0.5)
    mot_h = jnp.stack([avgpool(mot[..., 0]) * 0.5,
                       avgpool(mot[..., 1]) * 0.5], -1)
    out = warp_bilinear(jnp.asarray(hist), mot_h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_warp_pallas_matches_bilinear():
    """Pallas bounded-displacement warp == XLA gather bilinear for
    in-range motion (interpret mode, runs on CPU)."""
    from toyrenderer_tpu.ops.warp_pallas import warp_bilinear, MAX_DISP
    rng = np.random.default_rng(3)
    h, w = 48, 640
    img = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mot = rng.uniform(-(MAX_DISP - 1.5), MAX_DISP - 1.5,
                      size=(h, w, 2)).astype(np.float32)
    out = warp_bilinear(img, jnp.asarray(mot), interpret=True)
    py = np.arange(h, dtype=np.float32)[:, None] + np.zeros((1, w), np.float32)
    px = np.arange(w, dtype=np.float32)[None, :] + np.zeros((h, 1), np.float32)
    ref = T._sample_bilinear(img, jnp.asarray(py - mot[..., 1]),
                             jnp.asarray(px - mot[..., 0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


# --- tonemap -------------------------------------------------------------------

def test_tonemap_range_and_monotone():
    x = jnp.linspace(0.0, 50.0, 512)[:, None] * jnp.ones((1, 3))
    y = np.asarray(tonemap_pbr_neutral(x))
    assert y.min() >= 0.0 and y.max() <= 1.0
    assert (np.diff(y[:, 0]) >= -1e-6).all()
    # quadratic toe for dark achromatic input: out = 6.25 x^2
    lo = np.asarray(tonemap_pbr_neutral(jnp.full((1, 3), 0.05)))
    np.testing.assert_allclose(lo, 6.25 * 0.05 ** 2, atol=1e-6)
    # mid-grey passes nearly unchanged
    mid = np.asarray(tonemap_pbr_neutral(jnp.full((1, 3), 0.3)))
    np.testing.assert_allclose(mid, 0.3 - 0.04, atol=1e-6)


def test_compose_final_u8():
    hdr = jnp.full((4, 4, 3), 0.18)
    img = np.asarray(compose_final(hdr, exposure=1.0))
    assert img.dtype == np.uint8
    assert 100 < img[0, 0, 0] < 140   # 0.18 linear ~ 0.46 sRGB ~ 118
