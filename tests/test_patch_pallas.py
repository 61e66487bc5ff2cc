"""Pallas patch-extraction kernel vs the vmapped dynamic_slice path.

The kernel (kernels/patch_extract.py) must be bit-exact with ops/orb._patches
on the patch region, including clamped origins at image borders, and the
slab-aware one-hot descriptor path must produce identical packed bits.
Runs in interpreter mode on CPU CI; compiled on the real chip by
benchmarks/kernel_bench.py (winner recorded there).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_semantic_vo_tpu.core.config import ORBConfig
from stereo_semantic_vo_tpu.ops import orb as O


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(3)
    return jnp.asarray(rng.uniform(0, 255, (120, 400)).astype(np.float32))


class TestPatchKernel:
    def test_bit_exact_interior_and_borders(self, img):
        H, W = img.shape
        r = 15
        P = 2 * r + 1
        rng = np.random.RandomState(0)
        # interior + all four border-clamp cases + exact corners
        xs = np.concatenate([rng.randint(0, W, 56), [0, W - 1, 5, W - 3]])
        ys = np.concatenate([rng.randint(0, H, 56), [0, 2, H - 1, H - 2]])
        xy = jnp.stack([jnp.asarray(xs), jnp.asarray(ys)], -1).astype(jnp.int32)
        ref = O._patches(img, xy, r)
        slab = O._get_patches(img, xy, r, "pallas")
        assert slab.shape[1:] == (32, 128)
        np.testing.assert_array_equal(np.asarray(slab[:, :P, :P]), np.asarray(ref))

    def test_descriptor_and_angle_equal_through_slabs(self, img):
        H, W = img.shape
        r = 15
        rng = np.random.RandomState(1)
        xy = jnp.stack(
            [jnp.asarray(rng.randint(19, W - 19, 64)),
             jnp.asarray(rng.randint(19, H - 19, 64))], -1
        ).astype(jnp.int32)
        tight = O._patches(img, xy, r)
        slab = O._get_patches(img, xy, r, "pallas")
        d1 = O._describe_upright(tight, 7, 256, 31)
        d2 = O._describe_upright(slab, 7, 256, 31)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        a1 = O._orientation_from_patches(tight, r)
        a2 = O._orientation_from_patches(slab, r)
        # matvec reduction order differs (961 vs 4096 columns) -> float noise
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-4)

    def test_extract_orb_backend_equivalence(self, img):
        cfg_x = ORBConfig(max_keypoints=128, n_levels=3, steer=False, patch_backend="xla")
        cfg_p = ORBConfig(max_keypoints=128, n_levels=3, steer=False, patch_backend="pallas")
        kx = O.extract_orb(img, cfg_x)
        kp = O.extract_orb(img, cfg_p)
        np.testing.assert_array_equal(np.asarray(kx.desc), np.asarray(kp.desc))
        np.testing.assert_array_equal(np.asarray(kx.uv), np.asarray(kp.uv))
        np.testing.assert_array_equal(np.asarray(kx.valid), np.asarray(kp.valid))
