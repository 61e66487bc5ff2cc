import jax
import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.kernels import hamming
from stereo_semantic_vo_tpu.kernels.matcher import fused_best_match
from tests.test_hamming import random_desc


class TestFusedMatcher:
    def test_matches_reference_reduction(self):
        q = random_desc(jax.random.PRNGKey(0), 256)
        t = random_desc(jax.random.PRNGKey(1), 512)
        qv = jnp.arange(256) % 5 != 0
        tv = jnp.arange(512) % 7 != 0
        dist = hamming.hamming_distance_matrix(q, t)
        ref_idx, ref_best, ref_second = hamming.masked_best_match(dist, qv, tv)
        idx, best, second = fused_best_match(q, t, qv, tv)
        np.testing.assert_array_equal(best, ref_best)
        np.testing.assert_array_equal(second, ref_second)
        # argmin ties may resolve differently; distances at chosen idx must match
        chosen = jnp.take_along_axis(
            jnp.where(qv[:, None] & tv[None, :], dist, 257), idx[:, None], axis=1
        )[:, 0]
        np.testing.assert_array_equal(chosen, ref_best)

    def test_all_invalid(self):
        q = random_desc(jax.random.PRNGKey(2), 128)
        t = random_desc(jax.random.PRNGKey(3), 128)
        idx, best, second = fused_best_match(
            q, t, jnp.zeros(128, bool), jnp.ones(128, bool)
        )
        assert (np.asarray(best) == 257).all()

    def test_exact_match_found(self):
        q = random_desc(jax.random.PRNGKey(4), 128)
        t = jnp.concatenate([random_desc(jax.random.PRNGKey(5), 120), q[:8]])
        idx, best, second = fused_best_match(
            q, t, jnp.ones(128, bool), jnp.ones(128, bool)
        )
        np.testing.assert_array_equal(np.asarray(best[:8]), np.zeros(8))
        np.testing.assert_array_equal(np.asarray(idx[:8]), np.arange(120, 128))
