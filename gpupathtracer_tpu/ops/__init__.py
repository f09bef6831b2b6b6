"""Compute ops: intersection kernels, sampling warps, compaction primitives."""
