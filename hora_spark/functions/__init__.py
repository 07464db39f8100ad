"""Scalar/vectorized kernels: tokenizer, BM25 math, posting-block codec.

The analog of hora's src/core/ (metrics.rs kernels, simd_metrics.rs SIMD
variants, calc.rs helpers): pure functions with no engine state, pinned in
one place, with a fast vectorized path and a reference scalar path that must
agree bit-for-bit (mirroring the simd / non-simd dual implementation at
/root/reference/src/core/simd_metrics.rs:11-109).
"""
