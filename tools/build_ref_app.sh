#!/bin/sh
# Build the reference SvtAv1EncApp (COMPILE_C_ONLY — this image has no
# nasm/yasm, so the SIMD tiers are unbuildable) into /tmp/refbin for
# bench.py's vs_baseline measurement. The reference cmake hardcodes its
# output into the source tree; the binaries are moved out and the tree
# restored (do-not-write-to-reference rule).
set -e
BUILD=${1:-/tmp/refapp}
OUT=${2:-/tmp/refbin}
mkdir -p "$BUILD" "$OUT"
cd "$BUILD"
cmake /root/reference -GNinja -DCMAKE_BUILD_TYPE=Release -DCOMPILE_C_ONLY=ON \
      -DBUILD_APPS=ON -DBUILD_TESTING=OFF \
      -DCMAKE_C_FLAGS="-O3 -march=native" >/dev/null
ninja >/dev/null
cp /root/reference/Bin/Release/SvtAv1EncApp \
   /root/reference/Bin/Release/libSvtAv1Enc.so* "$OUT/"
rm -rf /root/reference/Bin
echo "reference app at $OUT/SvtAv1EncApp"
