"""Pallas sparse-stereo kernel vs the XLA strips path (interpreter mode —
see kernels/sparse_stereo.py STATUS for the compiled-path caveat)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_semantic_vo_tpu.core import Camera, CameraConfig
from stereo_semantic_vo_tpu.core.config import StereoConfig
from stereo_semantic_vo_tpu.ops.stereo import sparse_disparity
from tests.test_stereo import grid_keypoints, textured

CAM = Camera.from_config(CameraConfig())


@pytest.mark.skipif(jax.default_backend() != "cpu", reason="interpret mode only")
class TestPallasSparseStereo:
    def test_bit_exact_vs_strips(self):
        left = textured(0)
        right = np.roll(left, -12, axis=1)
        uv = grid_keypoints(*left.shape)
        pad = (-len(uv)) % 8
        uv = np.concatenate([uv, np.tile(uv[:1], (pad, 1))])
        valid = jnp.ones(len(uv), bool)
        cfg_s = StereoConfig(sparse_mode="strips")
        cfg_p = StereoConfig(sparse_mode="pallas")
        a = sparse_disparity(jnp.asarray(left), jnp.asarray(right), jnp.asarray(uv), valid, CAM, cfg_s)
        b = sparse_disparity(jnp.asarray(left), jnp.asarray(right), jnp.asarray(uv), valid, CAM, cfg_p)
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        va = np.asarray(a.valid)
        np.testing.assert_allclose(
            np.asarray(a.disparity)[va], np.asarray(b.disparity)[va], atol=1e-5
        )
