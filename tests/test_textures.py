"""Texture atlas + sampling tests."""

import numpy as np
import jax.numpy as jnp

from toyrenderer_tpu.scene import textures as TX
from toyrenderer_tpu.ops import texture as TS


def _atlas_from(img):
    return TX.build_atlas(images=[img]).to_device()


def test_atlas_mip_chain():
    img = TX.checkerboard(64, 4)
    atlas = TX.build_atlas(images=[img])
    assert atlas.num_mips[0] == 7          # 64 -> 1
    assert atlas.desc_width[0, 0] == 64
    assert atlas.desc_width[0, 6] == 1
    # mip texel counts sum
    assert atlas.desc_offset[0, 1] == 64 * 64


def test_sample_exact_texel():
    img = np.zeros((4, 4, 4), np.uint8)
    img[1, 2] = [255, 128, 0, 255]
    atlas = _atlas_from(img)
    # sample the center of texel (2, 1) at mip 0
    uv = jnp.asarray([[(2 + 0.5) / 4, (1 + 0.5) / 4]])
    c = np.asarray(TS.sample_texture(atlas, jnp.asarray([0]), uv))
    np.testing.assert_allclose(c[0], [1.0, 128 / 255, 0, 1.0], atol=2e-3)


def test_sample_bilinear_midpoint():
    img = np.zeros((1, 2, 4), np.uint8)
    img[0, 0] = [0, 0, 0, 255]
    img[0, 1] = [255, 255, 255, 255]
    atlas = _atlas_from(img)
    uv = jnp.asarray([[0.5, 0.5]])        # midpoint between both texels
    c = np.asarray(TS.sample_texture(atlas, jnp.asarray([0]), uv))
    np.testing.assert_allclose(c[0, :3], 0.5, atol=2e-3)


def test_wrap_modes():
    img = np.zeros((1, 2, 4), np.uint8)
    img[0, 0] = [255, 0, 0, 255]
    img[0, 1] = [0, 255, 0, 255]
    rep = TX.build_atlas(images=[img], wrap_modes=[TX.WRAP_REPEAT]
                         ).to_device()
    cl = TX.build_atlas(images=[img], wrap_modes=[TX.WRAP_CLAMP]
                        ).to_device()
    uv = jnp.asarray([[1.25, 0.5]])        # past the right edge
    c_rep = np.asarray(TS.sample_texture(rep, jnp.asarray([0]), uv))[0]
    c_cl = np.asarray(TS.sample_texture(cl, jnp.asarray([0]), uv))[0]
    assert c_rep[0] > 0.9 and c_rep[1] < 0.1     # wrapped to texel 0
    assert c_cl[1] > 0.45                        # clamped near texel 1


def test_mip_selection_and_clamp():
    img = TX.checkerboard(64, 32)          # high-frequency checker
    atlas = _atlas_from(img)
    uv = jnp.asarray([[2.5 / 64, 2.5 / 64]])   # center of a white tile
    tid = jnp.asarray([0])
    # huge derivatives -> coarsest mip (solid grey average)
    big = jnp.asarray([[1.0, 0.0]])
    c_far = np.asarray(TS.sample_texture(atlas, tid, uv, big,
                                         jnp.asarray([[0.0, 1.0]])))[0]
    assert abs(c_far[:3].mean() - (255 + 40) / 2 / 255) < 0.08
    # residency clamp: min_resident_mip redirects the desc rows so even
    # derivative-0 samples land on the coarse mip
    host = TX.build_atlas(images=[img])
    host.min_resident_mip[:] = 6
    clamped = host.to_device()
    tiny = jnp.zeros((1, 2))
    c_clamped = np.asarray(TS.sample_texture(clamped, tid, uv, tiny, tiny))
    c_fine = np.asarray(TS.sample_texture(atlas, tid, uv, tiny, tiny))
    assert abs(c_clamped[0, :3].mean() - c_far[:3].mean()) < 0.05
    assert abs(c_fine[0, :3].mean() - c_far[:3].mean()) > 0.1


def test_negative_id_is_white():
    atlas = _atlas_from(TX.checkerboard(8, 2))
    c = np.asarray(TS.sample_texture(atlas, jnp.asarray([-1]),
                                     jnp.asarray([[0.3, 0.7]])))
    np.testing.assert_allclose(c[0], 1.0)


def test_feedback_reduction():
    tex_id = jnp.asarray([[0, 0, 1], [2, -1, 0]])
    mips = jnp.asarray([[3.0, 1.0, 5.0], [2.0, 0.0, 7.0]])
    fb = np.asarray(TS.texture_feedback(tex_id, mips, 3))
    assert fb[0] == 1.0 and fb[1] == 5.0 and fb[2] == 2.0
