"""YOLO training-path tests: LR policies vs the darknet formula, region/yolo
loss semantics, BN train/eval + fold consistency, end-to-end overfit of one
box, and .weights checkpoint roundtrip (SURVEY.md §2.2 darknet training
parity; reference has no tests of its own — region_layer.c prints averages).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_semantic_vo_tpu.io import darknet
from stereo_semantic_vo_tpu.models import yolo, yolo_train

TRAIN_CFG = """
[net]
batch=4
width=64
height=64
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
burn_in=100
policy=steps
steps=1000,2000
scales=.1,.1

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
anchors = 0.5,0.5, 1.0,1.0, 2.0,2.0, 1.0,2.0, 2.0,1.0
bias_match=1
classes=1
coords=4
num=5
softmax=1
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
thresh=.6
rescore=0
"""


def _truths(boxes_per_img):
    """list of per-image [cx,cy,w,h,cls] lists -> (B, 30, 5), (B, 30)."""
    B = len(boxes_per_img)
    t = np.zeros((B, yolo_train.MAX_TRUTHS, 5), np.float32)
    m = np.zeros((B, yolo_train.MAX_TRUTHS), bool)
    for b, lst in enumerate(boxes_per_img):
        for i, box in enumerate(lst):
            t[b, i] = box
            m[b, i] = True
    return jnp.asarray(t), jnp.asarray(m)


class TestLearningRate:
    def test_burn_in_power_ramp(self):
        # network.c:95 — lr * (batch/burn_in)^power during burn-in
        net = {"learning_rate": 0.001, "burn_in": 100, "policy": "steps",
               "steps": (1000,), "scales": (0.1,), "power": 4}
        for b in (1, 50, 99):
            got = float(yolo_train.learning_rate(net, b))
            assert got == pytest.approx(0.001 * (b / 100) ** 4, rel=1e-5)

    def test_steps_policy(self):
        net = {"learning_rate": 0.001, "burn_in": 0, "policy": "steps",
               "steps": (1000, 2000), "scales": (0.1, 0.1)}
        assert float(yolo_train.learning_rate(net, 500)) == pytest.approx(1e-3)
        assert float(yolo_train.learning_rate(net, 1500)) == pytest.approx(1e-4)
        assert float(yolo_train.learning_rate(net, 2500)) == pytest.approx(1e-5, rel=1e-4)

    def test_poly_policy(self):
        net = {"learning_rate": 0.01, "burn_in": 0, "policy": "poly",
               "max_batches": 100, "power": 2}
        assert float(yolo_train.learning_rate(net, 50)) == pytest.approx(0.01 * 0.25)


class TestBatchNorm:
    def test_train_eval_and_fold_agree(self):
        """After folding, YoloDetector-style inference must equal the
        trainer's eval-mode forward (same rolling stats path)."""
        secs = darknet.parse_cfg(TRAIN_CFG)
        raw = darknet.random_weights_raw(secs, seed=3)
        # give BN stats non-trivial values
        for p in raw.values():
            if "scales" in p:
                rng = np.random.RandomState(0)
                p["mean"] = rng.randn(*p["mean"].shape).astype(np.float32) * 0.1
                p["var"] = rng.uniform(0.5, 2.0, p["var"].shape).astype(np.float32)
        x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)

        params = jax.tree.map(jnp.asarray, raw)
        heads_eval, _ = yolo_train.forward_train(params, secs, x, train=False)
        folded = darknet.fold_params(raw)
        heads_inf = yolo.forward(folded, secs, x)
        np.testing.assert_allclose(
            np.asarray(heads_eval[0][1]), np.asarray(heads_inf[0][1]), atol=1e-4
        )

    def test_rolling_stats_update(self):
        secs = darknet.parse_cfg(TRAIN_CFG)
        raw = darknet.random_weights_raw(secs, seed=0)
        params = jax.tree.map(jnp.asarray, raw)
        x = jnp.asarray(np.random.RandomState(2).rand(4, 64, 64, 3), jnp.float32)
        _, new_params = yolo_train.forward_train(params, secs, x, train=True)
        # rolling mean moved 1% toward the batch mean (batchnorm_layer.c:143)
        p0 = new_params[0]
        assert not np.allclose(np.asarray(p0["mean"]), raw[0]["mean"])
        assert np.all(np.isfinite(np.asarray(p0["var"])))


class TestRegionLoss:
    def _head(self, B=2, H=8, W=8, A=5, nc=1, seed=0):
        rng = np.random.RandomState(seed)
        feat = jnp.asarray(rng.randn(B, H, W, A * (5 + nc)).astype(np.float32) * 0.1)
        sec = darknet.parse_cfg(TRAIN_CFG)[-1]
        return feat, sec

    def test_noobject_only_when_empty(self):
        """With zero truths past burn-in, loss = 0.5*sum((0-obj)^2)."""
        feat, sec = self._head()
        t, m = _truths([[], []])
        s = yolo_train.region_loss(feat, sec, t, m, seen=yolo_train.BURN_IN_SEEN)
        f = np.asarray(feat).reshape(2, 8, 8, 5, 6)
        obj = 1 / (1 + np.exp(-f[..., 4]))
        assert float(s.loss) == pytest.approx(0.5 * np.sum(obj**2), rel=1e-4)
        assert float(s.count) == 0

    def test_burn_in_adds_prior_pull(self):
        feat, sec = self._head()
        t, m = _truths([[], []])
        s_burn = yolo_train.region_loss(feat, sec, t, m, seen=0)
        s_post = yolo_train.region_loss(feat, sec, t, m, seen=yolo_train.BURN_IN_SEEN)
        assert float(s_burn.loss) > float(s_post.loss)

    def test_assignment_hits_truth_cell(self):
        """Gradient wrt the head must be nonzero exactly at the truth cell's
        coord channels (beyond the global objectness field)."""
        feat, sec = self._head()
        t, m = _truths([[[0.5, 0.5, 0.25, 0.25, 0]], []])

        def coord_loss(f):
            return yolo_train.region_loss(f, sec, t, m, seen=yolo_train.BURN_IN_SEEN).loss

        g = np.asarray(jax.grad(coord_loss)(feat)).reshape(2, 8, 8, 5, 6)
        # truth center cell (4,4) in image 0: coord grads present for one anchor
        assert np.abs(g[0, 4, 4, :, 0:4]).max() > 0
        # image 1 has no truths: coord grads identically zero everywhere
        assert np.abs(g[1, :, :, :, 0:3]).max() == 0  # x,y,w channels

    def test_recall_perfect_prediction(self):
        """Craft raw head outputs that exactly predict the truth box — IoU
        must be ~1 and recall 1."""
        sec = darknet.parse_cfg(TRAIN_CFG)[-1]
        H = W = 8
        A, nc = 5, 1
        truth = [0.5625, 0.5625, 2.0 / W, 2.0 / H, 0]  # center of cell (4,4), anchor 2
        feat = np.zeros((1, H, W, A * (5 + nc)), np.float32)
        f = feat.reshape(1, H, W, A, 5 + nc)
        f[0, 4, 4, 2, 0] = 0.0  # sigmoid(0)=0.5 -> cx=(4+.5)/8
        f[0, 4, 4, 2, 2] = 0.0  # exp(0)*anchor_w/W = 2/8 ✓
        f[0, 4, 4, 2, 4] = 10.0  # objectness ~1
        t, m = _truths([[truth]])
        s = yolo_train.region_loss(jnp.asarray(feat), sec, t, m, seen=yolo_train.BURN_IN_SEEN)
        assert float(s.avg_iou) > 0.9
        assert float(s.recall) == 1.0
        assert float(s.avg_obj) > 0.99


class TestYoloLoss:
    def test_v3_head_runs_and_assigns(self):
        sec = {
            "type": "yolo", "mask": (0, 1, 2),
            "anchors": (10.0, 14.0, 23.0, 27.0, 37.0, 58.0, 81.0, 82.0),
            "classes": 2, "num": 4, "ignore_thresh": 0.7,
        }
        rng = np.random.RandomState(0)
        feat = jnp.asarray(rng.randn(1, 8, 8, 3 * 7).astype(np.float32) * 0.1)
        t, m = _truths([[[0.5, 0.5, 0.1, 0.1, 1]]])
        s = yolo_train.yolo_loss(feat, sec, t, m, net_w=256, net_h=256)
        assert float(s.count) == 1.0
        assert np.isfinite(float(s.loss))

    def test_mask_ownership(self):
        """A truth whose best anchor lives in another head's mask must not be
        assigned here (yolo_layer.c:208 best_n in-mask check)."""
        sec = {
            "type": "yolo", "mask": (0,),
            "anchors": (10.0, 10.0, 200.0, 200.0),
            "classes": 1, "num": 2, "ignore_thresh": 0.7,
        }
        feat = jnp.zeros((1, 8, 8, 1 * 6), jnp.float32)
        # big truth: best shape anchor is #1 (200px), not in mask (0,)
        t, m = _truths([[[0.5, 0.5, 0.8, 0.8, 0]]])
        s = yolo_train.yolo_loss(feat, sec, t, m, net_w=256, net_h=256)
        assert float(s.count) == 0.0


class TestTrainerEndToEnd:
    def test_overfit_single_box(self):
        """SGD steps on one repeated image+box must cut the loss by >5x
        and yield a confident detection at the truth location — the
        train_detector loop in miniature (no burn-in so the LR is live
        from step 0)."""
        cfg = TRAIN_CFG.replace("burn_in=100", "burn_in=0").replace(
            "learning_rate=0.001", "learning_rate=0.003"
        )
        trainer = yolo_train.YoloTrainer(cfg, seed=0)
        rng = np.random.RandomState(0)
        img = rng.rand(64, 64, 3).astype(np.float32)
        img[24:40, 24:40] = 1.0  # bright square = the object
        images = jnp.asarray(np.stack([img] * 4))
        t, m = _truths([[[0.5, 0.5, 0.25, 0.25, 0]]] * 4)

        losses = []
        for _ in range(150):  # BN rolling stats (0.99 EMA) need ~100 steps
            loss, stats = trainer.train_step(images, t, m)
            losses.append(loss)
        assert losses[-1] < losses[0] / 5, losses[::10]
        assert float(stats.avg_obj) > 0.5

        # folded inference finds the box
        det = yolo.YoloDetector(cfg, conf_threshold=0.3)
        det.params = trainer.folded_params()
        out = det.detect(jnp.asarray(img))
        assert bool(out.valid[0])
        cx = float(out.boxes[0, 0] + out.boxes[0, 2]) / 2
        cy = float(out.boxes[0, 1] + out.boxes[0, 3]) / 2
        assert abs(cx - 32) < 12 and abs(cy - 32) < 12

    def test_weights_checkpoint_roundtrip(self):
        trainer = yolo_train.YoloTrainer(TRAIN_CFG, seed=1)
        img = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3), jnp.float32)
        t, m = _truths([[[0.5, 0.5, 0.25, 0.25, 0]]] * 4)
        trainer.train_step(img, t, m)
        blob = trainer.export_weights()

        trainer2 = yolo_train.YoloTrainer(TRAIN_CFG, weights_bytes=blob)
        a = trainer.state.params
        b = trainer2.state.params
        for idx in a:
            np.testing.assert_allclose(
                np.asarray(a[idx]["w"]), np.asarray(b[idx]["w"]), atol=1e-6
            )
        # the inference loader accepts the same blob (fold path)
        det_params = darknet.load_weights(trainer.sections, blob)
        assert 0 in det_params

    def test_seen_counter_advances(self):
        trainer = yolo_train.YoloTrainer(TRAIN_CFG, seed=2)
        img = jnp.zeros((4, 64, 64, 3), jnp.float32)
        t, m = _truths([[]] * 4)
        trainer.train_step(img, t, m)
        assert int(trainer.state.seen) == 4
        assert int(trainer.state.batch_num) == 1


class TestDataParallelTraining:
    def test_psum_grad_step_matches_single_device(self):
        """shard_map the loss grad over the data axis with a psum — the
        framework's multi-chip training pattern (SURVEY §2.3) — and compare
        against the single-device gradient."""
        from jax.sharding import Mesh, PartitionSpec as P

        secs = darknet.parse_cfg(TRAIN_CFG)
        raw = darknet.random_weights_raw(secs, seed=0)
        params = jax.tree.map(jnp.asarray, raw)
        B = 8
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(B, 64, 64, 3), jnp.float32)
        t, m = _truths([[[0.5, 0.5, 0.25, 0.25, 0]]] * B)

        def loss_fn(p, img, tt, mm):
            heads, _ = yolo_train.forward_train(p, secs, img, train=True)
            sec, feat = heads[0]
            return yolo_train.region_loss(feat, sec, tt, mm, seen=yolo_train.BURN_IN_SEEN).loss

        g_single = jax.grad(loss_fn)(params, images, t, m)

        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

        @jax.jit
        @jax.shard_map(
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
        def dp_grad(p, img, tt, mm):
            g = jax.grad(loss_fn)(p, img, tt, mm)
            return jax.tree.map(lambda x: jax.lax.psum(x, "data"), g)

        g_dp = dp_grad(params, images, t, m)
        # per-shard BN statistics differ from global-batch BN, so compare
        # loosely in direction: same sign pattern and comparable magnitude
        a = np.asarray(g_single[0]["w"]).ravel()
        b = np.asarray(g_dp[0]["w"]).ravel()
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9
