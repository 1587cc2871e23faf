/* Stub mkl_service.h for the vendored Armadillo (configured with
 * ARMA_USE_MKL_ALLOC): it only needs mkl_malloc/mkl_free
 * (armadillo-8.400.0/include/armadillo:74-75,141).  Map to posix_memalign. */
#pragma once

#include <stdlib.h>

#ifdef __cplusplus
extern "C" {
#endif

static inline void *mkl_malloc(size_t size, int align) {
  void *p = NULL;
  if (align < (int)sizeof(void *)) align = (int)sizeof(void *);
  if (posix_memalign(&p, (size_t)align, size ? size : 1) != 0) return NULL;
  return p;
}

static inline void mkl_free(void *p) { free(p); }

#ifdef __cplusplus
}
#endif
