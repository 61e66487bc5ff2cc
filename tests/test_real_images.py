"""Real-photograph validation on the reference's vendored stereo fixtures.

Everything else in tests/ uses procedural imagery; these tests are the
ground-contact check.  Golden disparity maps in tests/fixtures/msa/ come from
the reference's own MSA dense engine (Thirdparty/MB/MSA.cpp:1132-1169) built
unmodified (tools/build_msa.sh); fixtures are the vendored Middlebury pairs
(Thirdparty/MB/img/, ndisp per Thirdparty/MB/main.cpp:16-40) and the real
urban driving pairs (Thirdparty/libelas/img/urban*.pgm).

Bounds are calibrated ~10-15%% below measured values (tools/real_image_report.py;
full table in docs/REAL_IMAGES.md) — they catch regressions, not tune-ups.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_semantic_vo_tpu.core.config import ORBConfig, StereoConfig
from stereo_semantic_vo_tpu.kernels.hamming import (
    hamming_distance_matrix,
    masked_best_match,
)
from stereo_semantic_vo_tpu.ops import orb
from stereo_semantic_vo_tpu.ops.dense_stereo import dense_disparity

from tests.fixtures_io import have_reference_fixtures, load_fixture

pytestmark = pytest.mark.skipif(
    not have_reference_fixtures(), reason="reference fixture images not present"
)


def _dense_metrics(name: str, refine: bool):
    left, right, ndisp, msa = load_fixture(name)
    cfg = StereoConfig(max_disparity=ndisp, refine=refine)
    out = dense_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    disp = np.asarray(out.disparity)
    valid = np.asarray(out.valid)
    H, W = left.shape
    xs = np.arange(W)[None, :]
    region = np.zeros((H, W), bool)
    region[4:-4, 4:-4] = True
    region &= xs >= ndisp  # columns that can even see their match
    both = region & (msa > 0) & valid
    err = np.abs(disp - msa)
    return {
        "density": valid[region].mean(),
        "agree3": (err[both] <= 3.0).mean(),
        "med": np.median(err[both]),
    }


class TestDenseVsMSA:
    """SGM engine vs the reference MSA solver on the same real pairs.

    These are two *different* aggregators (scanline SGM vs spanning-tree DP)
    sharing only the cost definition, so the comparison is an agreement
    budget, not bit-parity."""

    # fixture -> (min density, min agree@3px, max median |err|), refine=False
    BOUNDS = {
        "urban2": (0.58, 0.60, 2.0),  # measured 0.687 / 0.709 / 0.69
        "Teddy": (0.65, 0.70, 2.0),   # measured 0.766 / 0.804 / 0.43
        "ArtL": (0.38, 0.60, 2.0),    # measured 0.455 / 0.710 / 0.41
    }

    @pytest.mark.parametrize("name", sorted(BOUNDS))
    def test_agreement_with_msa(self, name):
        lo_density, lo_agree, hi_med = self.BOUNDS[name]
        m = _dense_metrics(name, refine=False)
        assert m["density"] >= lo_density, m
        assert m["agree3"] >= lo_agree, m
        assert m["med"] <= hi_med, m

    def test_refine_pass_repairs_density(self):
        """MSA's third (LR-guided) phase produces a dense map; ours must do
        the same — refine fills what the LR check rejected, without the
        surviving pixels drifting from MSA."""
        base = _dense_metrics("urban2", refine=False)
        ref = _dense_metrics("urban2", refine=True)
        assert ref["density"] > 0.95  # measured 1.000
        assert ref["density"] > base["density"] + 0.2
        assert ref["agree3"] >= 0.50  # measured 0.633 over the full image


class TestORBOnRealImages:
    """ORB extract + Hamming match across a real rectified pair: matched
    keypoints must land on the same scanline (|dv| small) with disparity in
    the operating range — the geometry the VO's gates assume
    (pnpmatch.cc:101,192 gate semantics)."""

    @pytest.mark.parametrize("name", ["urban1", "urban2"])
    def test_stereo_pair_matching(self, name):
        left, right, ndisp, _ = load_fixture(name)
        cfg = ORBConfig(max_keypoints=512)
        kl = orb.extract_orb(jnp.asarray(left), cfg)
        kr = orb.extract_orb(jnp.asarray(right), cfg)
        assert int(kl.valid.sum()) > 400  # real texture fills capacity

        dist = hamming_distance_matrix(kl.desc, kr.desc)
        idx, best, second = masked_best_match(dist, kl.valid, kr.valid)
        good = np.asarray(kl.valid) & (np.asarray(best) < 15)  # tracking gate
        assert good.sum() >= 30, "too few gate-15 matches on a real pair"

        uvl = np.asarray(kl.uv)[good]
        uvr = np.asarray(kr.uv)[np.asarray(idx)[good]]
        dv = np.abs(uvl[:, 1] - uvr[:, 1])
        dx = uvl[:, 0] - uvr[:, 0]
        inlier = (dv <= 2.0) & (dx >= -1.0) & (dx <= ndisp + 1.0)
        assert inlier.mean() >= 0.60, f"inlier rate {inlier.mean():.3f}"


class TestTemporalMatchingOnRealImages:
    """Frame-to-frame (temporal) matching on real texture — the tracking
    matcher's actual job (pnpmatch.cc:61-101 matches the *last frame's* map
    points, not the stereo partner).  Simulated ego-motion: shifted crops of
    the urban frames (a pure-yaw-like image translation plus a vertical
    nudge), which changes every keypoint's patch sampling grid the way
    inter-frame motion does."""

    @pytest.mark.parametrize("name", ["urban2", "urban3"])
    def test_shifted_crop_matching(self, name):
        left, _, _, _ = load_fixture(name)
        H, W = left.shape
        dx, dy = 14, 3  # ~KITTI-magnitude apparent motion at 10 Hz
        crop_w, crop_h = W - 2 * dx, H - 2 * dy
        f0 = left[dy : dy + crop_h, dx : dx + crop_w]
        f1 = left[2 * dy : 2 * dy + crop_h, 2 * dx : 2 * dx + crop_w]

        cfg = ORBConfig(max_keypoints=512)
        k0 = orb.extract_orb(jnp.asarray(f0), cfg)
        k1 = orb.extract_orb(jnp.asarray(f1), cfg)

        dist = hamming_distance_matrix(k0.desc, k1.desc)
        idx, best, second = masked_best_match(dist, k0.valid, k1.valid)
        good = np.asarray(k0.valid) & (np.asarray(best) < 15)  # tracking gate
        assert good.sum() >= 60, f"only {good.sum()} gate-15 temporal matches"

        uv0 = np.asarray(k0.uv)[good]
        uv1 = np.asarray(k1.uv)[np.asarray(idx)[good]]
        # ground-truth correspondence: the same scene pixel moved by (-dx, -dy)
        err = uv1 - uv0 - np.array([-dx, -dy], np.float32)
        inlier = np.linalg.norm(err, axis=1) <= 2.0
        assert inlier.mean() >= 0.80, f"temporal inlier rate {inlier.mean():.3f}"
