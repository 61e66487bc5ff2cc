"""Model zoo + online-detection pipeline plumbing."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_semantic_vo_tpu.io import darknet
from stereo_semantic_vo_tpu.models import yolo, zoo

REF_CFG_PATH = "/root/reference/bin/kitti/yolov2-tiny.cfg"


class TestZoo:
    def test_kitti_tiny_v2_structure(self):
        det = zoo.kitti_tiny_v2()
        infos = darknet.conv_layer_shapes(det.sections)
        assert [i["n"] for i in infos] == [16, 32, 64, 128, 256, 512, 1024, 512, 30]
        assert det.net_w == 352

    @pytest.mark.skipif(not os.path.exists(REF_CFG_PATH), reason="reference cfg absent")
    def test_matches_reference_cfg_layers(self):
        ours = darknet.conv_layer_shapes(zoo.kitti_tiny_v2().sections)
        ref = darknet.conv_layer_shapes(darknet.parse_cfg(open(REF_CFG_PATH).read()))
        assert [(i["n"], i["c"], i["size"], i["bn"]) for i in ours] == [
            (i["n"], i["c"], i["size"], i["bn"]) for i in ref
        ]

    def test_tiny_v3_two_heads(self):
        det = zoo.tiny_v3()
        x = jnp.zeros((1, 416, 416, 3))
        heads = yolo.forward(det.params, det.sections, x)
        assert len(heads) == 2

    def test_head_shape_kitti(self):
        det = zoo.kitti_tiny_v2()
        heads = yolo.forward(det.params, det.sections, jnp.zeros((1, 352, 352, 3)))
        assert heads[0][1].shape == (1, 11, 11, 30)


class TestOnlinePipeline:
    def test_pipeline_with_online_detector(self):
        """VOPipeline._detect plumbing: random-weight detector, low threshold
        so some boxes fire; tracking must still run."""
        import dataclasses

        from stereo_semantic_vo_tpu.engine.pipeline import VOPipeline
        from tests.test_tracker import CFG, render

        det = zoo.kitti_tiny_v2(conf_threshold=0.01, max_boxes=CFG.semantic.max_boxes)
        pipe = VOPipeline(CFG, detector=det, out_dir=None, write_trajectory=False)
        for t in range(3):
            left, right = render(t)
            pipe.process_frame(np.asarray(left), np.asarray(right), None, None, t * 0.1)
        pipe.flush()
        assert len(pipe.outputs) == 3
        assert bool(pipe.outputs[-1].pnp_ok)

    def test_pipeline_async_detector_one_frame_late(self):
        """async_detect=True: frame t tracks with frame t-1's boxes (the
        reference detector-thread staleness, semantic.cc:13-45) and no host
        sync happens on the detection path; culling still fires downstream
        (the one-frame-late scenario of test_semantic_culling)."""
        from stereo_semantic_vo_tpu.engine.pipeline import VOPipeline
        from tests.test_tracker import CFG, render

        det = zoo.kitti_tiny_v2(conf_threshold=0.01, max_boxes=CFG.semantic.max_boxes)
        pipe = VOPipeline(
            CFG, detector=det, out_dir=None, write_trajectory=False, async_detect=True
        )
        for t in range(3):
            left, right = render(t)
            pipe.process_frame(np.asarray(left), np.asarray(right), None, None, t * 0.1)
        pipe.flush()
        assert len(pipe.outputs) == 3
        assert bool(pipe.outputs[-1].pnp_ok)
        # detection results are device arrays pending for the *next* frame
        assert pipe._det_pending is not None
        boxes, valid = pipe._det_pending
        assert boxes.shape == (CFG.semantic.max_boxes, 4)
