#!/bin/bash
# Build the reference pocketkaldi CLI from /root/reference for transcript
# parity testing (tests/test_reference_parity.py).  The image has no
# OpenBLAS/autotools, so this compiles the sources directly against the
# system netlib BLAS (which exports cblas_sgemm) with a minimal cblas.h shim.
set -e
REF=${1:-/root/reference}
OUT=${2:-/tmp/refbuild}
mkdir -p "$OUT/shim"
cat > "$OUT/shim/cblas.h" <<'HDR'
#ifndef CBLAS_SHIM_H
#define CBLAS_SHIM_H
#ifdef __cplusplus
extern "C" {
#endif
typedef enum { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum { CblasNoTrans = 111, CblasTrans = 112, CblasConjTrans = 113 } CBLAS_TRANSPOSE;
void cblas_sgemm(CBLAS_ORDER Order, CBLAS_TRANSPOSE TransA, CBLAS_TRANSPOSE TransB,
                 int M, int N, int K, float alpha, const float *A, int lda,
                 const float *B, int ldb, float beta, float *C, int ldc);
#ifdef __cplusplus
}
#endif
#endif
HDR
g++ -std=c++11 -O2 -w \
  -I"$REF/src" -I"$REF/src/openfst/include" -I"$REF/src/gemmlowp" -I"$OUT/shim" \
  "$REF/src/main.cc" \
  "$REF"/src/{util,fst,matrix,pcm_reader,decoder,srfft,fbank,strlcpy,cmvn,nnet,am,vector,symbol_table,ce_stt,hashtable,configuration}.cc \
  "$REF/src/gemmlowp/eight_bit_int_gemm/eight_bit_int_gemm.cc" \
  "$REF"/src/openfst/lib/{compat,flags,fst,fst-types,mapped-file,properties,symbol-table,symbol-table-ops,weight,util}.cc \
  -o "$OUT/pocketkaldi" -lpthread -ldl /usr/lib/x86_64-linux-gnu/libblas.so.3 -lm
echo "built $OUT/pocketkaldi"
