#!/bin/sh
# Build the reference MSA solver (unmodified, from /root/reference) with the
# headless driver in tools/msa_driver.cpp.  Output: /tmp/msa_build/msa_ref.
# Used once to generate the golden fixtures in tests/fixtures/msa/ — not part
# of the framework build.
set -e
REF=/root/reference/Thirdparty/MB
OUT=${1:-/tmp/msa_build}
mkdir -p "$OUT"
gcc -O2 -c "$REF/ctmf.c" -o "$OUT/ctmf.o"
g++ -O2 -I"$REF" $(pkg-config --cflags opencv4) \
    tools/msa_driver.cpp "$REF/MSA.cpp" "$OUT/ctmf.o" \
    -o "$OUT/msa_ref" \
    $(pkg-config --libs opencv4)
echo "built $OUT/msa_ref"
