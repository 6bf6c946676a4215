"""Pallas TPU kernels — the framework's native acceleration layer.

The reference has no C++/CUDA source of its own (SURVEY.md §2: all native
acceleration there is prebuilt torch CUDA kernels); the TPU-native equivalent
is this kernel set, which puts the hot non-matmul-shaped work directly on the
MXU/VPU instead of host stand-ins.
"""
