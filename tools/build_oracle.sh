#!/bin/sh
# Build the reference C library as a test oracle (golden kernels).
# Out-of-tree; exports internal svt_* kernels by dropping -fvisibility=hidden.
set -e
BUILD=${1:-/tmp/refbuild2}
OUT=${2:-/tmp/refbin}
mkdir -p "$BUILD" "$OUT"
cd "$BUILD"
cmake /root/reference -GNinja -DCMAKE_BUILD_TYPE=Release -DCOMPILE_C_ONLY=ON \
      -DBUILD_APPS=OFF -DBUILD_TESTING=OFF >/dev/null
sed -i 's/-fvisibility=hidden//g; s/-flto=auto//g; s/-fno-fat-lto-objects//g' build.ninja
ninja
gcc -shared -o "$OUT/liboracle.so" \
    $(find . -path ./CMakeFiles -prune -o -name '*.o' -print) -lpthread -lm
# the reference CMake hardcodes output into the source tree; keep it pristine
rm -rf /root/reference/Bin
echo "oracle at $OUT/liboracle.so"
