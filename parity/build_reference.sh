#!/usr/bin/env bash
# Build the reference ISLETrain/ISLEInfer from /root/reference (or $1)
# WITHOUT Intel MKL, via the shim in parity/mkl_shim/.
#
# The reference Makefile hardcodes Intel MKL (reference Makefile:10-16) and
# its float path touches exactly 7 MKL-unique routines plus ~14 CBLAS
# wrappers (include/types.h:31-56 macro table).  parity/mkl_shim provides:
#   - mkl.h / mkl_service.h stub headers,
#   - plain-loop implementations of the MKL-unique sparse/util routines,
#   - CBLAS wrappers and ILP64 Fortran exports (for the vendored Armadillo,
#     which is configured ARMA_BLAS_LONG_LONG + no wrapper) forwarding to
#     the system LP64 Netlib libblas.so.3/liblapack.so.3 via dlopen.
#
# The result is a CORRECTNESS-faithful, 1-core reference build: Netlib BLAS
# is unblocked/serial, so wall-clocks measured from it are recorded in
# BENCH_NOTES with that caveat (they still anchor the baseline far better
# than a proxy-of-ourselves).
#
# Usage: parity/build_reference.sh [ref_dir]
# Exits 0 with "SKIP" only when the reference sources are absent.
set -eu
REF_DIR="${1:-/root/reference}"
HERE="$(cd "$(dirname "$0")" && pwd)"
SHIM="$HERE/mkl_shim"
OUT_DIR="$HERE/bin"
BUILD="$HERE/build"

if [ ! -f "$REF_DIR/Makefile" ]; then
    echo "SKIP: reference sources not found at $REF_DIR"
    exit 0
fi

# Flags match the reference Makefile:4-31 (asserts ON, as published).
FLAGS="-DLINUX -DMKL_ILP64 -DSINGLE -g -w -O3 -fopenmp -std=c++14"
INC="-I$SHIM -I$REF_DIR -I$REF_DIR/spectra-master \
     -I$REF_DIR/armadillo-8.400.0/include -I$REF_DIR/block-ks \
     -I$REF_DIR/include"

mkdir -p "$BUILD" "$OUT_DIR"
cd "$BUILD"

g++ $FLAGS -I"$SHIM" -c -o mkl_shim.o "$SHIM/mkl_shim.cpp"
for f in logger utils denseMatrix sparseMatrix trainer infer; do
    echo "  cc $f.cpp"
    g++ $FLAGS $INC -c -o "$f.o" "$REF_DIR/src/$f.cpp"
done
g++ $FLAGS $INC -o "$OUT_DIR/ISLETrain" "$REF_DIR/drivers/ISLETrain.cpp" \
    trainer.o utils.o denseMatrix.o sparseMatrix.o logger.o mkl_shim.o -ldl -lm
g++ $FLAGS $INC -o "$OUT_DIR/ISLEInfer" "$REF_DIR/drivers/ISLEInfer.cpp" \
    infer.o utils.o denseMatrix.o sparseMatrix.o logger.o mkl_shim.o -ldl -lm
echo "built: $OUT_DIR/ISLETrain $OUT_DIR/ISLEInfer"
