"""Darknet-style detection augmentation (models/augment.py): the truth
boxes must track the image transform exactly (data.c correct_boxes)."""

import numpy as np

from stereo_semantic_vo_tpu.models.augment import (
    augment_detection,
    distort_hsv,
    rand_scale,
)


def _img_with_square(H=96, W=128, y0=30, x0=40, h=20, w=24):
    img = np.full((H, W, 3), 0.2, np.float32)
    img[y0:y0 + h, x0:x0 + w] = 1.0
    t = np.zeros((4, 5), np.float32)
    t[0] = ((x0 + w / 2) / W, (y0 + h / 2) / H, w / W, h / H, 0)
    m = np.zeros(4, bool)
    m[0] = True
    return img, t, m


class TestAugment:
    def test_identity_when_disabled(self):
        img, t, m = _img_with_square()
        rng = np.random.RandomState(0)
        a, t2, m2 = augment_detection(
            img, t, m, rng, jitter=0.0, hue=0.0, saturation=1.0,
            exposure=1.0, flip=False,
        )
        np.testing.assert_allclose(a, img, atol=1e-6)
        np.testing.assert_allclose(t2, t, atol=1e-6)
        assert (m2 == m).all()

    def test_box_tracks_the_square(self):
        """After a random crop+flip the truth box must still cover the
        bright square's actual pixel extent."""
        for seed in range(8):
            img, t, m = _img_with_square()
            rng = np.random.RandomState(seed)
            a, t2, m2 = augment_detection(
                img, t, m, rng, jitter=0.2, hue=0.0, saturation=1.0,
                exposure=1.0, flip=True,
            )
            if not m2[0]:
                continue  # square cropped out — legitimate draw
            H, W, _ = a.shape
            ys, xs = np.where(a[..., 0] > 0.9)
            if len(xs) < 20:
                continue
            cx, cy, w, h = t2[0, :4]
            box = (
                (cx - w / 2) * W, (cy - h / 2) * H,
                (cx + w / 2) * W, (cy + h / 2) * H,
            )
            # measured extent within the (clamped) truth box, +-2px resample slack
            assert box[0] - 2 <= xs.min() and xs.max() <= box[2] + 2, (seed, box, xs.min(), xs.max())
            assert box[1] - 2 <= ys.min() and ys.max() <= box[3] + 2, (seed, box, ys.min(), ys.max())

    def test_flip_mirrors_truth(self):
        img, t, m = _img_with_square()

        class FlipRng(np.random.RandomState):
            def randint(self, *a, **k):
                return 1  # force the flip branch

        a, t2, m2 = augment_detection(
            img, t, m, FlipRng(0), jitter=0.0, hue=0.0, saturation=1.0,
            exposure=1.0, flip=True,
        )
        np.testing.assert_allclose(a, img[:, ::-1], atol=1e-6)
        assert abs(t2[0, 0] - (1.0 - t[0, 0])) < 1e-6
        assert abs(t2[0, 1] - t[0, 1]) < 1e-6

    def test_rand_scale_range(self):
        rng = np.random.RandomState(1)
        vs = [rand_scale(rng, 1.5) for _ in range(200)]
        assert all(1 / 1.5 - 1e-9 <= v <= 1.5 + 1e-9 for v in vs)
        assert min(vs) < 1.0 < max(vs)

    def test_hsv_roundtrip_identity(self):
        rng = np.random.RandomState(2)
        img = rng.rand(16, 16, 3).astype(np.float32)
        out = distort_hsv(img, rng, hue=0.0, saturation=1.0, exposure=1.0)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_grayscale_exposure_only(self):
        """On a gray image (all channels equal) hue/sat are no-ops; only
        exposure moves pixel values — and channels stay equal."""
        rng = np.random.RandomState(3)
        g = rng.rand(8, 8, 1).astype(np.float32)
        img = np.repeat(g, 3, axis=-1)
        out = distort_hsv(img, rng, hue=0.1, saturation=1.5, exposure=1.5)
        np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
        np.testing.assert_allclose(out[..., 0], out[..., 2], atol=1e-6)
