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


# ---------------------------------------------------------------------------
# Tile-granularity streaming (TileStreamingManager)
# ---------------------------------------------------------------------------

def _sample_mip0(dev, n=8):
    """Sample an n x n grid of points at mip 0 (tiny derivatives)."""
    g = (np.arange(n) + 0.5) / n
    uv = jnp.asarray([[u, v] for v in g for u in g])
    k = uv.shape[0]
    d = jnp.full((k, 2), 1e-4)
    return np.asarray(TS.sample_texture(dev, jnp.zeros(k, jnp.int32),
                                        uv, d, d))


@pytest.fixture()
def tile_mgr():
    from toyrenderer_tpu.engine.streaming import TileStreamingManager
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (256, 256, 4), dtype=np.uint8)
    img[..., 3] = 255
    atlas = TX.build_atlas(images=[img])
    return atlas, TileStreamingManager(atlas, pool_tiles=32,
                                       tiles_per_frame=8,
                                       evict_after=5)


def test_tiles_initial_fallback_then_refine(tile_mgr):
    atlas, m = tile_mgr
    # 256: mip0 = 4x4 tiles, mip1 (128) = 2x2 tiles (pinned), mip2+ static
    assert m.first_tiled[0] == 1
    assert m.stats['resident_tiles'] == 4          # pinned 2x2

    truth = _sample_mip0(atlas.to_device())
    ov = m.update(np.full(m.table_size, np.inf))
    dev = dict(atlas.to_device())
    dev.update(ov)
    got0 = _sample_mip0(dev)
    # fallback serves the pinned coarser mip: content differs from the
    # true mip 0 on a 16-tile checker (coarser mip averages pairs)
    assert not np.allclose(got0, truth, atol=0.05)

    # drive with real device feedback until resident
    for _ in range(8):
        maps = TS.sample_material_maps(
            dev, jnp.zeros(64, jnp.int32),
            jnp.asarray([[(i % 8 + 0.5) / 8, (i // 8 + 0.5) / 8]
                         for i in range(64)]),
            jnp.full((64, 2), 1e-4), jnp.full((64, 2), 1e-4))
        fb = np.full(m.table_size, np.inf, np.float32)
        tid = np.asarray(maps['tile_id'])
        des = np.asarray(maps['desired'])
        for i in range(64):
            if tid[i] >= 0:
                fb[tid[i]] = min(fb[tid[i]], des[i])
        ov = m.update(fb)
        dev = dict(atlas.to_device())
        dev.update(ov)
    got = _sample_mip0(dev)
    np.testing.assert_allclose(got, truth, atol=1e-3)
    assert m.stats['tile_loads'] >= 16 + 4         # all mip-0 tiles in


def test_tiles_evict_and_defrag(tile_mgr):
    atlas, m = tile_mgr
    # load everything
    fb_hot = np.zeros(m.table_size, np.float32)
    for _ in range(6):
        m.update(fb_hot)
    resident_peak = m.stats['resident_tiles']
    assert resident_peak > 4
    # go cold: everything but the pinned fallback evicts
    for _ in range(10):
        ov = m.update(np.full(m.table_size, np.inf))
    assert m.stats['tile_evictions'] > 0
    assert m.stats['resident_tiles'] == 4
    # pool compacted: occupied slots are the lowest ones
    occupied = sorted(m.tile_of_slot)
    assert occupied == list(range(m.slot0, m.slot0 + len(occupied)))
    # correctness after defrag moves: fallback sampling still works
    dev = dict(atlas.to_device())
    dev.update(ov)
    got = _sample_mip0(dev)
    assert np.isfinite(got).all()
    # and re-loading after defrag still lands correct content
    for _ in range(8):
        ov = m.update(fb_hot)
    dev = dict(atlas.to_device())
    dev.update(ov)
    truth = _sample_mip0(atlas.to_device())
    np.testing.assert_allclose(_sample_mip0(dev), truth, atol=1e-3)


def test_tile_manager_scales_to_4k_pool():
    """Bookkeeping must stay O(hot tiles) per update: a 4096-tile pool
    over a large texture set updates fast even with a big tile table
    (the round-2 per-hot-tile grid scans and per-move free-list sorts
    were quadratic here)."""
    import time
    from toyrenderer_tpu.engine.streaming import TileStreamingManager
    rng = np.random.default_rng(3)
    imgs = []
    for _ in range(24):
        img = rng.integers(0, 256, (512, 512, 4), dtype=np.uint8)
        img[..., 3] = 255
        imgs.append(img)
    atlas = TX.build_atlas(images=imgs)
    m = TileStreamingManager(atlas, pool_tiles=4096, tiles_per_frame=64,
                             defrag_per_frame=16, evict_after=4)
    assert m.table_size > 2000       # big tile table

    # inverse table agrees with the grid layout everywhere
    for tid in range(0, m.table_size, 97):
        t, mm, ty, tx = m.tid_key[tid]
        tb = m.tile_base[t, mm]
        ht, wt = m.grid[(int(t), int(mm))]
        assert tb <= tid < tb + ht * wt
        assert tid == tb + ty * wt + tx

    # drive updates with a few hot tiles + churn; must stay fast
    fb = np.full(m.table_size, np.inf, np.float32)
    hot = rng.choice(m.table_size, 64, replace=False)
    fb[hot] = 0.0
    m.update(fb)                      # warm (device upload compile)
    t0 = time.time()
    for i in range(12):
        fb[:] = np.inf
        hot = rng.choice(m.table_size, 64, replace=False)
        fb[hot] = 0.0
        m.update(fb)
    dt = (time.time() - t0) / 12
    # generous wall-clock bound: the quadratic-bookkeeping regression
    # this guards measured >1 s/update; CI machines under parallel load
    # flaked the tighter 0.25 s and then the 0.6 s bound (608 ms seen
    # with a TPU batch + full suite sharing the host)
    assert dt < 0.9, f"update too slow: {dt*1e3:.1f} ms"
    # defrag + eviction churn kept the table consistent: every entry
    # either points at a resident slot or a pinned fallback
    resident = m.table_slot >= 0
    ent = m.table
    assert (ent[resident] == m.table_slot[resident]).all()
    fall = ent[~resident]
    assert ((fall >> 24) > 0).all() or fall.size == 0


def test_async_tile_bank_streams_from_disk(tmp_path):
    """Tile bytes come from DISK through the async bank: the manager
    never touches atlas.texels (they're replaced by a 1-row stub), reads
    happen on the pool thread, and streamed-in tiles match the original
    data bit-exactly (TextureFeedbackManager.cpp:319-331 silent_async
    parity)."""
    import time
    from dataclasses import replace
    from toyrenderer_tpu.engine.streaming import (
        TileStreamingManager, TexelTileBank)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (256, 256, 4), dtype=np.uint8)
    img[..., 3] = 255
    atlas = TX.build_atlas(images=[img])
    bank_path = str(tmp_path / "texels.bank")
    TexelTileBank.write(atlas, bank_path)

    # metadata-only atlas: texels stubbed out — the backing store is
    # the bank on disk, proving scenes larger than host RAM can stream
    stub = replace(atlas, texels=np.zeros((1, atlas.texels.shape[1]),
                                          np.uint32))
    src = TexelTileBank(bank_path)
    m = TileStreamingManager(stub, pool_tiles=32, tiles_per_frame=8,
                             evict_after=10, source=src)

    # full-res feedback on mip0 tiles: loads arrive ASYNCHRONOUSLY —
    # first update schedules reads, later updates upload
    fb = np.full(m.table_size, np.inf, np.float32)
    tb0 = int(m.tile_base[0, 0])
    fb[tb0:tb0 + 4] = 0.0
    loaded_immediately = None
    ov = None
    for i in range(20):
        ov = m.update(fb)
        if i == 0:
            loaded_immediately = m.stats['tile_loads']
        if all((0, 0, ty, tx) in m.slot_of
               for ty, tx in ((0, 0), (0, 1), (0, 2), (0, 3))):
            break
        time.sleep(0.02)
    assert src.stats['async_reads'] >= 4
    for k in range(4):
        assert (0, 0, 0, k) in m.slot_of, "tile never streamed in"

    # streamed content matches the original atlas data bit-exactly
    pool = np.asarray(ov['tex_texels'])
    slot = m.slot_of[(0, 0, 0, 0)]
    from toyrenderer_tpu.engine.streaming import TILE, TILE_ROWS
    got = pool[slot * TILE_ROWS:(slot + 1) * TILE_ROWS]
    w = int(atlas.desc_width[0, 0])
    h = int(atlas.desc_height[0, 0])
    o = int(atlas.desc_offset[0, 0])
    want = atlas.texels[o:o + w * h].reshape(h, w, -1)[
        :TILE, :TILE].reshape(TILE_ROWS, -1)
    assert np.array_equal(got, want)
