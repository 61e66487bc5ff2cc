"""Robust fundamental-matrix fit + dynamic culling verdict.

The reference runs OpenCV FM_8POINT over ratio-filtered fresh matches
(pnpmatch.cc:302-337) and culls map points whose epipolar distance exceeds
0.1 px (pnpmatch.cc:103-144).  Our fit sees *all* gated background matches,
so it must survive the occasional gross outlier the Hamming gate lets
through — the IRLS reweighting rounds exist exactly for that.
"""

import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.ops.epipolar import (
    epipolar_distance,
    fit_fundamental,
    sampson_distance,
)

CULL_PX = 0.1  # the dynamic-culling threshold (core/config.py MatcherConfig)


def _stereo_like_matches(K=96, seed=0):
    """Rectified laterally-translating camera: correspondences shift purely in
    x, so every epipolar line is horizontal and inliers have zero vertical
    motion."""
    rng = np.random.RandomState(seed)
    uv1 = np.stack(
        [rng.uniform(30, 600, K), rng.uniform(20, 350, K)], axis=-1
    ).astype(np.float32)
    disp = rng.uniform(4, 40, K).astype(np.float32)
    uv2 = uv1.copy()
    uv2[:, 0] -= disp
    return uv1, uv2


class TestRobustFit:
    def test_clean_fit_is_tight(self):
        uv1, uv2 = _stereo_like_matches()
        w = jnp.ones(len(uv1), jnp.float32)
        F = fit_fundamental(jnp.asarray(uv1), jnp.asarray(uv2), w)
        d = np.asarray(epipolar_distance(F, jnp.asarray(uv1), jnp.asarray(uv2)))
        assert d.max() < 0.01

    def test_gross_outlier_survived(self):
        """One wildly wrong background match must not skew F enough to flip
        the 0.1 px culling verdict on the other matches — and a genuine
        off-epipolar mover must still be flagged."""
        uv1, uv2 = _stereo_like_matches()
        uv2_bad = uv2.copy()
        uv2_bad[0] += (35.0, 25.0)  # gross mismatch at full gate weight
        w = jnp.ones(len(uv1), jnp.float32)

        F_irls = fit_fundamental(jnp.asarray(uv1), jnp.asarray(uv2_bad), w)
        F_naive = fit_fundamental(
            jnp.asarray(uv1), jnp.asarray(uv2_bad), w, irls_iters=0
        )

        clean1, clean2 = jnp.asarray(uv1[1:]), jnp.asarray(uv2[1:])
        d_irls = np.asarray(epipolar_distance(F_irls, clean1, clean2))
        d_naive = np.asarray(epipolar_distance(F_naive, clean1, clean2))

        # the un-reweighted fit is visibly poisoned; the IRLS fit is not
        assert d_irls.max() < CULL_PX, f"background would be mis-culled: {d_irls.max()}"
        assert d_irls.max() < d_naive.max()

        # a vertical mover (off the horizontal epilines) still gets flagged
        mover1 = jnp.asarray([[300.0, 100.0]])
        mover2 = jnp.asarray([[290.0, 106.0]])  # 6 px off-epipolar
        d_mover = float(epipolar_distance(F_irls, mover1, mover2)[0])
        assert d_mover > CULL_PX

    def test_sampson_zero_for_exact(self):
        uv1, uv2 = _stereo_like_matches(seed=3)
        w = jnp.ones(len(uv1), jnp.float32)
        F = fit_fundamental(jnp.asarray(uv1), jnp.asarray(uv2), w)
        s = np.asarray(sampson_distance(F, jnp.asarray(uv1), jnp.asarray(uv2)))
        assert s.max() < 0.01
