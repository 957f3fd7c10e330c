"""Virtual-texture streaming manager tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from toyrenderer_tpu.scene import textures as TX
from toyrenderer_tpu.engine.streaming import TextureStreamingManager
from toyrenderer_tpu.ops import texture as TS


@pytest.fixture()
def mgr():
    atlas = TX.build_atlas(images=[TX.checkerboard(256, 8),
                                   TX.checkerboard(128, 4)])
    return atlas, TextureStreamingManager(atlas, pool_texels=1 << 20,
                                          textures_per_frame=10)


def test_initial_residency_coarse_only(mgr):
    atlas, m = mgr
    # only mips <= 32x32 resident at start
    assert (m.resident_min > 0).all()
    for t in range(m.n_tex):
        assert atlas.desc_width[t, m.resident_min[t]] <= 32
        # resident descriptors valid, finer ones absent
        assert m.desc_offset[t, m.resident_min[t]] >= 0
        assert m.desc_offset[t, 0] == -1


def test_streams_in_on_demand(mgr):
    atlas, m = mgr
    fb = np.asarray([0.0, np.inf])      # texture 0 wants mip 0
    for _ in range(10):
        ov = m.update(fb)
    assert m.resident_min[0] == 0
    assert m.desc_offset[0, 0] >= 0
    # samples from the pool must match the original mip-0 data
    dev = dict(atlas.to_device())
    dev.update(ov)
    uv = jnp.asarray([[0.3, 0.7]])
    got = np.asarray(TS.sample_texture(dev, jnp.asarray([0]), uv,
                                       jnp.zeros((1, 2)),
                                       jnp.zeros((1, 2))))
    want = np.asarray(TS.sample_texture(atlas.to_device(),
                                        jnp.asarray([0]), uv,
                                        jnp.zeros((1, 2)),
                                        jnp.zeros((1, 2))))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_evicts_when_unneeded(mgr):
    atlas, m = mgr
    for _ in range(10):
        m.update(np.asarray([0.0, 0.0]))
    assert m.resident_min[0] == 0
    tex_before = m.stats['resident_texels']
    for _ in range(20):
        m.update(np.asarray([np.inf, np.inf]))   # nothing sampled
    assert m.resident_min[0] > 0
    assert m.stats['evictions'] > 0
    assert m.stats['resident_texels'] < tex_before


def test_pool_allocator_reuses_space(mgr):
    _, m = mgr
    total_free_before = sum(sz for _, sz in m.free)
    for _ in range(10):
        m.update(np.asarray([0.0, 0.0]))
    for _ in range(30):
        m.update(np.asarray([np.inf, np.inf]))
    for _ in range(10):
        m.update(np.asarray([0.0, 0.0]))
    # blocks merged back and reused — free space bounded
    assert sum(sz for _, sz in m.free) <= total_free_before
    # no overlapping live blocks
    blocks = sorted(m.block_of.values())
    for (o1, s1), (o2, _) in zip(blocks, blocks[1:]):
        assert o1 + s1 <= o2
