#!/usr/bin/env bash
# Build the reference ISLETrain/ISLEInfer from /root/reference (or $1).
#
# The reference Makefile hardcodes Intel MKL at
# /opt/intel/compilers_and_libraries/linux (reference Makefile:10-16) and
# uses MKL's sparse BLAS (mkl_scsrmm/mkl_scscmm/... via include/types.h),
# so a drop-in OpenBLAS swap is NOT possible — OpenBLAS has no sparse
# csrmm. Two supported paths:
#
#   (a) MKL installed (oneAPI): point INTEL_ROOT/MKL_ROOT at it and make.
#   (b) No MKL: install Intel oneMKL standalone (free, apt/yum/offline
#       installer), then (a). There is no non-MKL build of the reference
#       without reimplementing its sparse BLAS calls; document the gap
#       in the parity report instead of faking numbers.
#
# Usage: parity/build_reference.sh [ref_dir] [mkl_root]
# Exits 0 with "SKIP" when MKL is absent (the harness stays dormant).
set -u
REF_DIR="${1:-/root/reference}"
MKL_ROOT="${2:-${MKLROOT:-/opt/intel/oneapi/mkl/latest}}"
OUT_DIR="$(cd "$(dirname "$0")" && pwd)/bin"

if [ ! -f "$REF_DIR/Makefile" ]; then
    echo "SKIP: reference sources not found at $REF_DIR"
    exit 0
fi
if [ ! -d "$MKL_ROOT/include" ]; then
    echo "SKIP: MKL not found at $MKL_ROOT (set MKLROOT); see header" \
         "comments for why OpenBLAS cannot substitute"
    exit 0
fi

# /root/reference is read-only in the build environment: build from a copy.
WORK="$(mktemp -d)"
cp -r "$REF_DIR"/. "$WORK/"
cd "$WORK"
# Point the Makefile at the provided MKL (oneAPI layout has lib/ instead
# of lib/intel64 — normalize with a symlink if needed).
sed -i "s|^INTEL_ROOT=.*|INTEL_ROOT=$(dirname "$MKL_ROOT")|" Makefile
sed -i "s|^MKL_ROOT=.*|MKL_ROOT=$MKL_ROOT|" Makefile
if [ ! -d "$MKL_ROOT/lib/intel64" ] && [ -d "$MKL_ROOT/lib" ]; then
    ln -sfn "$MKL_ROOT/lib" "$MKL_ROOT/lib/intel64" 2>/dev/null || true
fi
make -j"$(nproc)" ISLETrain ISLEInfer
mkdir -p "$OUT_DIR"
cp ISLETrain ISLEInfer "$OUT_DIR/"
echo "built: $OUT_DIR/ISLETrain $OUT_DIR/ISLEInfer"
