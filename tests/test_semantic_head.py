"""Replicated semantic head on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.parallel import mesh as mesh_utils
from stereo_semantic_vo_tpu.parallel.mesh import DATA_AXIS
from stereo_semantic_vo_tpu.parallel.semantic_head import make_replicated_detector
from tests.test_yolo import TINY_CFG


class TestReplicatedDetector:
    def test_batch_sharded_detection(self):
        m = mesh_utils.make_mesh(8, axis=DATA_AXIS)
        detect = make_replicated_detector(
            m, TINY_CFG, conf_threshold=0.3, max_boxes=4, img_hw=(48, 96)
        )
        imgs = jnp.asarray(
            np.random.RandomState(0).uniform(0, 1, (8, 48, 96, 3)).astype(np.float32)
        )
        out = detect(imgs)
        assert out.boxes.shape == (8, 4, 4)
        assert out.valid.shape == (8, 4)

    def test_replicated_matches_single(self):
        m = mesh_utils.make_mesh(2, axis=DATA_AXIS)
        detect = make_replicated_detector(
            m, TINY_CFG, conf_threshold=0.3, max_boxes=4, img_hw=(48, 96)
        )
        img = np.random.RandomState(1).uniform(0, 1, (48, 96, 3)).astype(np.float32)
        imgs = jnp.asarray(np.stack([img, img]))
        out = detect(imgs)
        # identical inputs on both shards -> identical outputs
        np.testing.assert_allclose(np.asarray(out.boxes[0]), np.asarray(out.boxes[1]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.valid[0]), np.asarray(out.valid[1]))
