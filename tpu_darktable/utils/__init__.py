"""Utilities: stage timing / profiling (TPU analog of csrc/cuda_utils.h)."""

from .timing import StageTimer, benchmark_op, trace_to

__all__ = ['StageTimer', 'benchmark_op', 'trace_to']
