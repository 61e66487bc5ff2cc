"""Pallas FAST-scoring kernel vs the XLA formulation (interpreter on CPU)."""

import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.kernels.fast_score import fast_scores_pallas
from stereo_semantic_vo_tpu.ops import orb


def synth(seed=0, H=120, W=200):
    img = np.zeros((H, W), np.float32)
    rng = np.random.RandomState(seed)
    for _ in range(25):
        y, x = rng.randint(10, H - 20), rng.randint(10, W - 20)
        img[y : y + rng.randint(6, 14), x : x + rng.randint(6, 14)] = rng.uniform(60, 255)
    return jnp.asarray(img)


class TestFastPallas:
    def test_bit_exact_interior(self):
        """Identical to ops/orb._fast_score away from the 3-px border (the
        XLA path wraps at image edges, the kernel zero-pads; extract_orb
        masks a 19-px border so integration never sees the difference)."""
        img = synth()
        ours = fast_scores_pallas(img, (20.0, 7.0))
        refs = orb._fast_score(img, 20.0, 7.0)
        for o, r in zip(ours, refs):
            np.testing.assert_array_equal(
                np.asarray(o)[3:-3, 3:-3], np.asarray(r)[3:-3, 3:-3]
            )

    def test_nonsquare_unaligned_shape(self):
        img = synth(3, H=97, W=307)  # not multiples of 8 / 128
        ours = fast_scores_pallas(img, (20.0,))
        refs = orb._fast_score(img, 20.0)
        np.testing.assert_array_equal(
            np.asarray(ours[0])[3:-3, 3:-3], np.asarray(refs[0])[3:-3, 3:-3]
        )

    def test_single_threshold_matches_two(self):
        img = synth(7)
        hi2, lo2 = fast_scores_pallas(img, (20.0, 7.0))
        (hi1,) = fast_scores_pallas(img, (20.0,))
        np.testing.assert_array_equal(np.asarray(hi1), np.asarray(hi2))
