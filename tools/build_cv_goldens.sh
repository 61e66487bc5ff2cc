#!/bin/sh
# Build tools/cv_goldens.cpp and regenerate the OpenCV golden fixtures in
# tests/fixtures/cv/ (keypoints + solver outputs the JAX geometry stack is
# cross-validated against).  Inputs are produced deterministically by
# tools/make_cv_inputs.py.  Not part of the framework build.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/cv_goldens_build}
mkdir -p "$OUT" tests/fixtures/cv
g++ -O2 tools/cv_goldens.cpp -o "$OUT/cv_goldens" \
    $(pkg-config --cflags --libs opencv4)
python tools/make_cv_inputs.py tests/fixtures/cv
for fx in urban1 urban2 urban3 urban4; do
  "$OUT/cv_goldens" orb /root/reference/Thirdparty/libelas/img/${fx}_left.pgm \
      tests/fixtures/cv/${fx}_cvorb.txt
done
"$OUT/cv_goldens" pnp  tests/fixtures/cv/pnp_input.txt  tests/fixtures/cv/pnp_golden.txt
"$OUT/cv_goldens" fmat tests/fixtures/cv/fmat_input.txt tests/fixtures/cv/fmat_golden.txt
echo done
