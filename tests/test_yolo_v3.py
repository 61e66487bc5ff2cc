"""YOLOv3-style graph support: route / upsample / shortcut, multiple [yolo]
heads with anchor masks (the reference ships yolo_layer.c alongside the
region head; full v3 cfgs must run)."""

import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.io import darknet
from stereo_semantic_vo_tpu.models import yolo

V3_MINI_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
size=1
stride=1
pad=1
filters=18
activation=linear

[yolo]
mask = 3,4,5
anchors = 10,14, 23,27, 37,58, 81,82, 135,169, 344,319
classes=1
num=6

[route]
layers = -3

[upsample]
stride=2

[route]
layers = -1, 0

[convolutional]
size=1
stride=1
pad=1
filters=18
activation=linear

[yolo]
mask = 0,1,2
anchors = 10,14, 23,27, 37,58, 81,82, 135,169, 344,319
classes=1
num=6
"""


class TestYoloV3Graph:
    def test_conv_shapes_through_routes(self):
        secs = darknet.parse_cfg(V3_MINI_CFG)
        infos = darknet.conv_layer_shapes(secs)
        # route -1,0 concatenates upsampled 16ch with layer-0 8ch = 24
        assert [(i["n"], i["c"]) for i in infos] == [
            (8, 3), (16, 8), (16, 16), (18, 16), (18, 24)
        ]

    def test_two_heads_and_shapes(self):
        secs = darknet.parse_cfg(V3_MINI_CFG)
        params = darknet.random_weights(secs)
        heads = yolo.forward(params, secs, jnp.zeros((1, 64, 64, 3)))
        assert len(heads) == 2
        (s1, f1), (s2, f2) = heads
        assert f1.shape == (1, 16, 16, 18)  # stride 4 head
        assert f2.shape == (1, 32, 32, 18)  # upsampled head

    def test_yolo_decode_anchor_mask(self):
        secs = darknet.parse_cfg(V3_MINI_CFG)
        head = [s for s in secs if s["type"] == "yolo"][0]
        head["_net_w"] = head["_net_h"] = 64
        H = W = 4
        feat = np.full((1, H, W, 3 * 6), -20.0, np.float32)
        blk = feat.reshape(1, H, W, 3, 6)
        blk[0, 0, 0, 0] = [0.0, 0.0, 0.0, 0.0, 20.0, 20.0]
        boxes, cls, obj = yolo.decode_head(head, jnp.asarray(feat), 1)
        b = np.asarray(boxes[0, 0])
        # mask 3,4,5 -> first anchor is (81, 82), v3 scaling: /net_w
        np.testing.assert_allclose(b[2], 81.0 / 64, atol=1e-5)
        np.testing.assert_allclose(b[3], 82.0 / 64, atol=1e-5)
        assert float(obj[0, 0]) > 0.99

    def test_detector_end_to_end(self):
        det = yolo.YoloDetector(V3_MINI_CFG, conf_threshold=0.3, max_boxes=8)
        img = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (100, 160)).astype(np.float32))
        out = det.detect(img)
        assert out.boxes.shape == (8, 4)
