import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_semantic_vo_tpu.io import darknet
from stereo_semantic_vo_tpu.models import yolo

TINY_CFG = """
[net]
batch=1
width=96
height=96
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
size=1
stride=1
pad=1
filters=30
activation=linear

[region]
anchors = 0.5,0.8, 1.0,1.5, 1.2,2.0, 1.5,3.0, 2.5,4.5
classes=1
num=5
softmax=1
thresh=.6
"""

REF_CFG_PATH = "/root/reference/bin/kitti/yolov2-tiny.cfg"


class TestCfgParser:
    def test_parse_tiny(self):
        secs = darknet.parse_cfg(TINY_CFG)
        assert secs[0]["type"] == "net"
        assert secs[0]["width"] == 96
        types = [s["type"] for s in secs[1:]]
        assert types == ["convolutional", "maxpool", "convolutional", "maxpool",
                         "convolutional", "region"]
        assert secs[-1]["anchors"] == (0.5, 0.8, 1.0, 1.5, 1.2, 2.0, 1.5, 3.0, 2.5, 4.5)
        assert secs[-1]["classes"] == 1

    def test_conv_shapes(self):
        infos = darknet.conv_layer_shapes(darknet.parse_cfg(TINY_CFG))
        assert [(i["n"], i["c"], i["size"]) for i in infos] == [
            (8, 3, 3), (16, 8, 3), (30, 16, 1)
        ]
        assert [i["bn"] for i in infos] == [True, True, False]

    @pytest.mark.skipif(not os.path.exists(REF_CFG_PATH), reason="reference cfg absent")
    def test_parse_reference_kitti_cfg(self):
        secs = darknet.parse_cfg(open(REF_CFG_PATH).read())
        assert secs[0]["width"] == 352 and secs[0]["height"] == 352
        infos = darknet.conv_layer_shapes(secs)
        assert [i["n"] for i in infos] == [16, 32, 64, 128, 256, 512, 1024, 512, 30]
        region = [s for s in secs if s["type"] == "region"][0]
        assert region["classes"] == 1 and region["num"] == 5


class TestWeightsIO:
    def test_roundtrip_and_bn_fold(self):
        secs = darknet.parse_cfg(TINY_CFG)
        rng = np.random.RandomState(0)
        raw = {}
        for info in darknet.conv_layer_shapes(secs):
            n, c, size = info["n"], info["c"], info["size"]
            raw[info["index"]] = {
                "biases": rng.randn(n).astype(np.float32),
                "scales": rng.uniform(0.5, 2, n).astype(np.float32),
                "mean": rng.randn(n).astype(np.float32),
                "var": rng.uniform(0.5, 2, n).astype(np.float32),
                "w_oihw": rng.randn(n, c, size, size).astype(np.float32),
            }
        blob = darknet.save_weights(secs, raw)
        params = darknet.load_weights(secs, blob)
        # check folding math on layer 0 (has BN)
        info0 = darknet.conv_layer_shapes(secs)[0]
        r = raw[info0["index"]]
        inv_std = darknet.bn_inv_std(r["var"])
        w_expect = r["w_oihw"] * (r["scales"] * inv_std)[:, None, None, None]
        b_expect = r["biases"] - r["scales"] * r["mean"] * inv_std
        got = params[info0["index"]]
        np.testing.assert_allclose(got["w"], np.transpose(w_expect, (2, 3, 1, 0)), rtol=1e-5)
        np.testing.assert_allclose(got["b"], b_expect, rtol=1e-5)
        # no-BN layer: weights unchanged
        info2 = darknet.conv_layer_shapes(secs)[2]
        np.testing.assert_allclose(
            params[info2["index"]]["w"],
            np.transpose(raw[info2["index"]]["w_oihw"], (2, 3, 1, 0)),
        )

    def test_truncated_raises(self):
        secs = darknet.parse_cfg(TINY_CFG)
        with pytest.raises(ValueError):
            darknet.load_weights(secs, b"\x00" * 32)


class TestForward:
    def test_shapes(self):
        secs = darknet.parse_cfg(TINY_CFG)
        params = darknet.random_weights(secs)
        x = jnp.zeros((1, 96, 96, 3))
        heads = yolo.forward(params, secs, x)
        assert len(heads) == 1
        sec, feat = heads[0]
        assert sec["type"] == "region"
        assert feat.shape == (1, 24, 24, 30)  # 96 / 2 / 2 = 24

    def test_stride1_maxpool_keeps_size(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = yolo._maxpool(x, 2, 1)
        assert y.shape == (1, 4, 4, 1)
        assert float(y[0, 3, 3, 0]) == 15.0


class TestDecode:
    def test_region_box_math(self):
        """Single hot cell: verify against region_layer.c:76-83 formulas."""
        H = W = 4
        na, nc = 5, 1
        feat = np.full((1, H, W, na * (5 + nc)), -20.0, np.float32)
        # anchor 1, cell (i=2, j=1): tx=0, ty=0, tw=log(2), th=0, obj=+20
        blk = feat.reshape(1, H, W, na, 5 + nc)
        blk[0, 1, 2, 1] = [0.0, 0.0, np.log(2.0), 0.0, 20.0, 20.0]
        sec = {"type": "region", "num": 5, "softmax": 1,
               "anchors": (0.5, 0.8, 1.0, 1.5, 1.2, 2.0, 1.5, 3.0, 2.5, 4.5)}
        boxes, cls, obj = yolo.decode_head(sec, jnp.asarray(feat), nc)
        flat_idx = (1 * W + 2) * na + 1
        b = np.asarray(boxes[0, flat_idx])
        np.testing.assert_allclose(b[0], (2 + 0.5) / W, atol=1e-5)   # bx
        np.testing.assert_allclose(b[1], (1 + 0.5) / H, atol=1e-5)   # by
        np.testing.assert_allclose(b[2], 2.0 * 1.0 / W, atol=1e-5)   # bw = exp(tw)*anchor/W
        np.testing.assert_allclose(b[3], 1.5 / H, atol=1e-5)
        assert float(obj[0, flat_idx]) > 0.99

    def test_nms_suppresses_overlap(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
        )
        scores = jnp.asarray([0.9, 0.8, 0.7])
        b, s, v = yolo.nms_fixed(boxes, scores, 3, 0.45)
        assert bool(v[0]) and bool(v[1]) and not bool(v[2])
        np.testing.assert_allclose(np.asarray(s[:2]), [0.9, 0.7], atol=1e-6)

    def test_letterbox_shape_and_padding(self):
        img = jnp.ones((376, 1241, 3)) * 0.25
        out = yolo.letterbox(img, 352, 352, 1241, 376)
        assert out.shape == (352, 352, 3)
        # top rows are padding
        np.testing.assert_allclose(np.asarray(out[0, :, 0]), 0.5)
        # middle rows contain image
        assert abs(float(out[176, 176, 0]) - 0.25) < 1e-5


class TestDetectorEndToEnd:
    def test_smoke_kitti_shape(self):
        det = yolo.YoloDetector(TINY_CFG, conf_threshold=0.5, max_boxes=8)
        img = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (120, 200)).astype(np.float32))
        out = det.detect(img)
        assert out.boxes.shape == (8, 4)
        assert out.valid.dtype == bool

    @pytest.mark.skipif(not os.path.exists(REF_CFG_PATH), reason="reference cfg absent")
    def test_reference_cfg_runs(self):
        det = yolo.YoloDetector(open(REF_CFG_PATH).read(), conf_threshold=0.8)
        img = jnp.zeros((376, 1241), jnp.float32)
        out = det.detect(img)
        assert out.boxes.shape == (32, 4)
