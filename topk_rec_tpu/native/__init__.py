"""Native (C++) host runtime: fast text IO and a golden CPU ALS solver.

Built on demand via ``make -C topk_rec_tpu/native``; all callers fall back
to pure-Python implementations when the shared library is absent.
"""
