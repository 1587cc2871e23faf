/* Minimal MKL-compatible header for building the reference ISLE on a box
 * without Intel MKL (VERDICT round-4 "next round" item 1).
 *
 * Scope: exactly the surface the reference's live code touches —
 * enumerated from /root/reference/include/types.h:31-56 (the FP macro
 * table) plus every call site in include/, src/, drivers/, block-ks/:
 *   - CBLAS float routines: sgemm, sgemv, ssymv, sdot, saxpy, sscal,
 *     scopy, sasum, snrm2, isamin (isamin does not exist in Netlib BLAS;
 *     implemented as a loop in the shim).
 *   - MKL-unique sparse/util routines: mkl_scsrmm, mkl_scscmm (dead but
 *     declared), mkl_scsrcsc, mkl_sdnscsr, mkl_cspblas_scsrgemv,
 *     mkl_somatcopy, mkl_set_num_threads_local.
 *   - LAPACKE_sgesvd is referenced only from commented-out code
 *     (include/deletedCode.h); declared for macro hygiene, not defined.
 *
 * The reference builds with -DMKL_ILP64 (Makefile:8) and its vendored
 * Armadillo is configured with ARMA_BLAS_LONG_LONG + no wrapper
 * (armadillo-8.400.0/include/armadillo_bits/config.hpp:59,74), so the
 * whole program calls 64-bit-integer Fortran BLAS/LAPACK symbols.  The
 * shim translation unit (mkl_shim.cpp) exports those ILP64 symbols and
 * forwards to the system LP64 Netlib libblas.so.3 / liblapack.so.3 via
 * dlopen + integer narrowing.
 */
#pragma once

#include <stddef.h>

#ifdef MKL_ILP64
typedef long long MKL_INT;
typedef unsigned long long MKL_UINT;
#else
typedef int MKL_INT;
typedef unsigned int MKL_UINT;
#endif

#ifdef __cplusplus
extern "C" {
#endif

/* ---- CBLAS types (values match the standard cblas.h) ---- */
typedef enum { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_LAYOUT;
typedef enum { CblasNoTrans = 111, CblasTrans = 112, CblasConjTrans = 113 } CBLAS_TRANSPOSE;
typedef enum { CblasUpper = 121, CblasLower = 122 } CBLAS_UPLO;
typedef CBLAS_LAYOUT CBLAS_ORDER;
typedef size_t CBLAS_INDEX;

/* ---- CBLAS float surface (live call sites only) ---- */
float cblas_sasum(const MKL_INT n, const float *x, const MKL_INT incx);
void  cblas_saxpy(const MKL_INT n, const float a, const float *x,
                  const MKL_INT incx, float *y, const MKL_INT incy);
void  cblas_scopy(const MKL_INT n, const float *x, const MKL_INT incx,
                  float *y, const MKL_INT incy);
float cblas_sdot(const MKL_INT n, const float *x, const MKL_INT incx,
                 const float *y, const MKL_INT incy);
float cblas_snrm2(const MKL_INT n, const float *x, const MKL_INT incx);
void  cblas_sscal(const MKL_INT n, const float a, float *x, const MKL_INT incx);
CBLAS_INDEX cblas_isamin(const MKL_INT n, const float *x, const MKL_INT incx);
void  cblas_sgemv(const CBLAS_LAYOUT layout, const CBLAS_TRANSPOSE trans,
                  const MKL_INT m, const MKL_INT n, const float alpha,
                  const float *a, const MKL_INT lda, const float *x,
                  const MKL_INT incx, const float beta, float *y,
                  const MKL_INT incy);
void  cblas_ssymv(const CBLAS_LAYOUT layout, const CBLAS_UPLO uplo,
                  const MKL_INT n, const float alpha, const float *a,
                  const MKL_INT lda, const float *x, const MKL_INT incx,
                  const float beta, float *y, const MKL_INT incy);
void  cblas_sgemm(const CBLAS_LAYOUT layout, const CBLAS_TRANSPOSE transa,
                  const CBLAS_TRANSPOSE transb, const MKL_INT m,
                  const MKL_INT n, const MKL_INT k, const float alpha,
                  const float *a, const MKL_INT lda, const float *b,
                  const MKL_INT ldb, const float beta, float *c,
                  const MKL_INT ldc);

/* ---- MKL sparse BLAS / utility surface ---- */
/* C := alpha*op(A)*B + beta*C; A is m-by-k CSR (4-array variant).
 * Only the combination the reference uses is supported by the shim:
 * transa='N', matdescra "G??C?" (general, zero-based, row-major B/C). */
void mkl_scsrmm(const char *transa, const MKL_INT *m, const MKL_INT *n,
                const MKL_INT *k, const float *alpha, const char *matdescra,
                const float *val, const MKL_INT *indx, const MKL_INT *pntrb,
                const MKL_INT *pntre, const float *b, const MKL_INT *ldb,
                const float *beta, float *c, const MKL_INT *ldc);
/* Declared because types.h maps FPcscmm to it; no live call site. */
void mkl_scscmm(const char *transa, const MKL_INT *m, const MKL_INT *n,
                const MKL_INT *k, const float *alpha, const char *matdescra,
                const float *val, const MKL_INT *indx, const MKL_INT *pntrb,
                const MKL_INT *pntre, const float *b, const MKL_INT *ldb,
                const float *beta, float *c, const MKL_INT *ldc);
/* job[0]=0: CSR->CSC; job[0]=1: CSC->CSR (matUtils.h:98-107 uses the
 * latter with zero-based indexing on a square max_dim matrix). */
void mkl_scsrcsc(const MKL_INT *job, const MKL_INT *m,
                 float *acsr, MKL_INT *ja, MKL_INT *ia,
                 float *acsc, MKL_INT *ja1, MKL_INT *ia1, MKL_INT *info);
/* job[0]=1: CSR->dense, row-major with leading dimension *lda
 * (denseMatrix.cpp:238 uses job {1,0,0,2,0,0}). */
void mkl_sdnscsr(const MKL_INT *job, const MKL_INT *m, const MKL_INT *n,
                 float *adns, const MKL_INT *lda,
                 float *acsr, MKL_INT *ja, MKL_INT *ia, MKL_INT *info);
/* y := A*x for square m CSR with zero-based indices ("csp" = C-style). */
void mkl_cspblas_scsrgemv(const char *transa, const MKL_INT *m,
                          const float *a, const MKL_INT *ia,
                          const MKL_INT *ja, const float *x, float *y);
/* Out-of-place scaled copy/transpose; ordering 'C'=column-major,
 * 'R'=row-major; trans 'N'/'T'. */
void mkl_somatcopy(char ordering, char trans, size_t rows, size_t cols,
                   const float alpha, const float *a, size_t lda,
                   float *b, size_t ldb);

int  mkl_set_num_threads_local(int nt);
void mkl_set_num_threads(int nt);
int  mkl_get_max_threads(void);

/* ---- LAPACKE (referenced only by dead code; declaration only) ---- */
#define LAPACK_ROW_MAJOR 101
#define LAPACK_COL_MAJOR 102
typedef MKL_INT lapack_int;
lapack_int LAPACKE_sgesvd(int matrix_layout, char jobu, char jobvt,
                          lapack_int m, lapack_int n, float *a,
                          lapack_int lda, float *s, float *u,
                          lapack_int ldu, float *vt, lapack_int ldvt,
                          float *superb);

#ifdef __cplusplus
}
#endif
