"""Bit-parity of the Pallas scanline SGM kernel vs the XLA lax.scan path.

The kernel (kernels/sgm_scan.py) replaces ops/dense_stereo._sgm_pass's
latency-bound scan with a VMEM-streamed recurrence; its update uses the
identical min tree and add order, so outputs must match to float rounding
(the only permitted divergence is fma contraction differences).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_semantic_vo_tpu.kernels.sgm_scan import (
    sgm_aggregate_pallas,
    sgm_bidirectional,
)
from stereo_semantic_vo_tpu.ops.dense_stereo import _sgm_pass, sgm_aggregate
from stereo_semantic_vo_tpu.core.config import StereoConfig


def _vol(h=40, w=150, d=48, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(0, 3, (h, w, d)).astype(np.float32))


P1, P2 = 1.0, 8.0


class TestDirectionalParity:
    def test_horizontal_bidirectional(self):
        vol = _vol()
        ref = _sgm_pass(vol, P1, P2, 1, False) + _sgm_pass(vol, P1, P2, 1, True)
        got = sgm_bidirectional(jnp.transpose(vol, (1, 2, 0)), P1, P2)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (2, 0, 1))), np.asarray(ref),
            rtol=0, atol=1e-4,
        )

    def test_vertical_bidirectional(self):
        vol = _vol(seed=1)
        ref = _sgm_pass(vol, P1, P2, 0, False) + _sgm_pass(vol, P1, P2, 0, True)
        got = sgm_bidirectional(jnp.transpose(vol, (0, 2, 1)), P1, P2)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (0, 2, 1))), np.asarray(ref),
            rtol=0, atol=1e-4,
        )

    def test_four_path_aggregate(self):
        vol = _vol(seed=2)
        cfg = StereoConfig(dense_backend="xla")  # reference path even on TPU
        ref = sgm_aggregate(vol, cfg)
        got = sgm_aggregate_pallas(vol, cfg.p1, cfg.p2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=2e-4)

    def test_unaligned_shapes(self):
        # S and X both far from block multiples; padding must never leak
        vol = _vol(h=13, w=67, d=48, seed=3)
        ref = _sgm_pass(vol, P1, P2, 1, False) + _sgm_pass(vol, P1, P2, 1, True)
        got = sgm_bidirectional(jnp.transpose(vol, (1, 2, 0)), P1, P2)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (2, 0, 1))), np.asarray(ref),
            rtol=0, atol=1e-4,
        )

    def test_edge_aware_p2_parity(self):
        # per-position P2 plane: XLA scan path vs Pallas kernel path
        vol = _vol(seed=5)
        H, W, _ = vol.shape
        rng = np.random.RandomState(7)
        p2x = jnp.asarray(rng.uniform(1.0, 8.0, (H, W)).astype(np.float32))
        ref = (
            _sgm_pass(vol, P1, 0.0, 1, False, p2x)
            + _sgm_pass(vol, P1, 0.0, 1, True, p2x)
        )
        got = sgm_bidirectional(
            jnp.transpose(vol, (1, 2, 0)), P1, 0.0, p2x=p2x.T
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (2, 0, 1))), np.asarray(ref),
            rtol=0, atol=1e-4,
        )

    def test_scalar_p2x_matches_scalar_p2(self):
        # a constant per-position P2 plane must reproduce the scalar path
        vol = _vol(seed=4)
        v = jnp.transpose(vol, (1, 2, 0))  # (W, D, H)
        plane = jnp.full((v.shape[0], v.shape[2]), P2, jnp.float32)
        a = sgm_bidirectional(v, P1, P2)
        b = sgm_bidirectional(v, P1, 0.0, p2x=plane)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)
