import os

import numpy as np
import pytest

from stereo_semantic_vo_tpu.io import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not buildable here"
)


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths_l, paths_r, arrays = [], [], []
    for i in range(6):
        img = rng.randint(0, 256, (48, 64), dtype=np.uint8)
        p = str(root / f"l{i}.png")
        Image.fromarray(img).save(p)
        paths_l.append(p)
        arrays.append(img)
        img_r = rng.randint(0, 256, (48, 64), dtype=np.uint8)
        pr = str(root / f"r{i}.png")
        Image.fromarray(img_r).save(pr)
        paths_r.append(pr)
    return paths_l, paths_r, arrays


class TestDecode:
    def test_gray_png_exact(self, pngs):
        paths_l, _, arrays = pngs
        out = native_loader.decode_gray(paths_l[0], 48, 64)
        np.testing.assert_allclose(out, arrays[0].astype(np.float32))

    def test_rgb_png_luma(self, tmp_path):
        from PIL import Image

        rgb = np.zeros((8, 8, 3), np.uint8)
        rgb[..., 0] = 200  # pure red
        p = str(tmp_path / "rgb.png")
        Image.fromarray(rgb).save(p)
        out = native_loader.decode_gray(p, 8, 8)
        np.testing.assert_allclose(out, np.full((8, 8), 0.299 * 200), atol=0.5)

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            native_loader.decode_gray("/nonexistent.png", 8, 8)


class TestPrefetcher:
    def test_in_order_and_exact(self, pngs):
        paths_l, paths_r, arrays = pngs
        loader = native_loader.NativeFrameLoader(paths_l, paths_r, 48, 64, depth=2, workers=3)
        got = list(loader)
        assert len(got) == 6
        for i, (l, r) in enumerate(got):
            np.testing.assert_allclose(l, arrays[i].astype(np.float32))

    def test_early_close(self, pngs):
        paths_l, paths_r, _ = pngs
        loader = native_loader.NativeFrameLoader(paths_l, paths_r, 48, 64)
        it = iter(loader)
        next(it)
        loader.close()  # must not hang or crash
