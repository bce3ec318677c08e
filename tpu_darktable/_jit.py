"""Jit-cache helpers shared by the workspace-style wrapper classes.

The reference pre-allocates CUDA workspaces per camera geometry
(SURVEY.md section 1 L1); on TPU, jax.jit specialization on static shapes
plays that role.  Wrappers hold a jitted closure; XLA's compile cache keys on
input shapes, so 'construct once per geometry, reuse per frame' falls out
for free.
"""

from __future__ import annotations

import functools

import jax


def jit_with_static(fn, **static_kwargs):
    """Bind static (python-value) kwargs and jit the result."""
    return jax.jit(functools.partial(fn, **static_kwargs))
