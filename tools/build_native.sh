#!/bin/sh
# Build native helper libraries (C) into svt_av1_psy_tpu/native/build/.
set -e
DIR=$(dirname "$0")/../svt_av1_psy_tpu/native
OUT="$DIR/build"
mkdir -p "$OUT"
gcc -O2 -shared -fPIC -o "$OUT/libdav1dshim.so" "$DIR/dav1d_shim.c" -l:libdav1d.so.6
echo "built $OUT/libdav1dshim.so"
