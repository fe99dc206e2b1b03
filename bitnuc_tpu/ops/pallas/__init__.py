"""Pallas TPU kernels — the throughput path (the reference's SIMD back-end
analog, see SURVEY.md §2.4). Each kernel has a pure-XLA twin used as the
in-process parity oracle."""
