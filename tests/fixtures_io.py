"""Loaders for the real-image stereo fixtures vendored by the reference.

The reference ships real stereo pairs it uses for manual verification:
Middlebury pairs at Thirdparty/MB/img/ (driven by Thirdparty/MB/main.cpp with
known ndisp values) and rectified pairs (incl. four real urban driving scenes)
at Thirdparty/libelas/img/.  tests/fixtures/msa/ holds golden disparity maps
generated from the reference's own MSA solver (MSA.cpp:1132-1169) built
unmodified via tools/build_msa.sh + tools/msa_driver.cpp.
"""

from __future__ import annotations

import os

import numpy as np

REF_ROOT = "/root/reference"
MB_IMG = os.path.join(REF_ROOT, "Thirdparty/MB/img")
ELAS_IMG = os.path.join(REF_ROOT, "Thirdparty/libelas/img")
MSA_GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "msa")

# name -> (left path, right path, ndisp, golden scale, golden file)
# ndisp per Thirdparty/MB/main.cpp:16 (Teddy d=59) and the Middlebury-3
# quarter-size convention for ArtL (256/4 = 64); urban/cones use the
# reference's KITTI operating range d=48 (frame.cc:87).
FIXTURES = {
    "ArtL": (f"{MB_IMG}/ArtL0.png", f"{MB_IMG}/ArtL1.png", 64, 3, "ArtL.d64s3.pgm"),
    "Teddy": (f"{MB_IMG}/Teddy0.png", f"{MB_IMG}/Teddy1.png", 59, 4, "Teddy.d59s4.pgm"),
    "cones": (f"{ELAS_IMG}/cones_left.pgm", f"{ELAS_IMG}/cones_right.pgm", 59, 4, "cones.d59s4.pgm"),
    "urban1": (f"{ELAS_IMG}/urban1_left.pgm", f"{ELAS_IMG}/urban1_right.pgm", 48, 5, "urban1.d48s5.pgm"),
    "urban2": (f"{ELAS_IMG}/urban2_left.pgm", f"{ELAS_IMG}/urban2_right.pgm", 48, 5, "urban2.d48s5.pgm"),
    "urban3": (f"{ELAS_IMG}/urban3_left.pgm", f"{ELAS_IMG}/urban3_right.pgm", 48, 5, "urban3.d48s5.pgm"),
    "urban4": (f"{ELAS_IMG}/urban4_left.pgm", f"{ELAS_IMG}/urban4_right.pgm", 48, 5, "urban4.d48s5.pgm"),
}


def have_reference_fixtures() -> bool:
    return os.path.isdir(MB_IMG) and os.path.isdir(ELAS_IMG)


def read_pgm(path: str) -> np.ndarray:
    """Binary P5 PGM (handles comment lines) -> (H, W) uint8/uint16."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P5"):
        raise ValueError(f"not a binary PGM: {path}")
    # tokenize header: magic, width, height, maxval (comments start with #)
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    img = np.frombuffer(data, dtype=dtype, count=h * w, offset=i).reshape(h, w)
    return img


def read_gray(path: str) -> np.ndarray:
    """Image file -> (H, W) float32 grayscale in [0, 255]."""
    if path.endswith(".pgm"):
        return read_pgm(path).astype(np.float32)
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), dtype=np.float32)


def read_rgb(path: str) -> np.ndarray | None:
    """Image file -> (H, W, 3) float32 in [0, 255], or None when the source
    carries no color (PGM fixtures: urban*, cones are grayscale captures)."""
    if path.endswith(".pgm"):
        return None
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)


def load_fixture(name: str):
    """-> (left, right, ndisp, msa_disparity) with msa in raw pixels,
    -1 where the golden byte is 0 (MSA never outputs disparity 0 for valid
    texture; 0 doubles as its invalid/unknown value after scaling)."""
    lp, rp, ndisp, scale, golden = FIXTURES[name]
    left = read_gray(lp)
    right = read_gray(rp)
    g = read_pgm(os.path.join(MSA_GOLDEN, golden)).astype(np.float32)
    msa = np.where(g > 0, g / scale, -1.0)
    return left, right, ndisp, msa
