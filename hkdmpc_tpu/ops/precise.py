"""Exact-f32 small-matrix products for TPU.

On TPU, jnp.matmul/einsum at default precision run on the MXU as bf16
passes. For the solver's 24-dim matvecs and quadratic forms that is the
dominant accuracy loss (scripts/exp_accuracy_oracle.py: final-cost max rel
deviation 2.5e-2 vs the f64 oracle at default precision, 3.7e-6 at
precision="highest") — and the MXU is wasted on 576-MAC products anyway.

These helpers express the products as broadcast multiply + sum: VPU f32
FMAs, no bf16 rounding, fully fusable. Same trick the Pallas backward
kernel uses internally (ops/pallas_backward.py FMA slabs).
"""

from __future__ import annotations

import jax.numpy as jnp


def mv(M, v):
    """(..., m, n) @ (..., n) -> (..., m) in exact f32 (VPU)."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def vm(v, M):
    """(..., m) @ (..., m, n) -> (..., n) in exact f32 (VPU)."""
    return jnp.sum(v[..., :, None] * M, axis=-2)


def quad(v, M, w):
    """v @ M @ w -> (...,) in exact f32 (VPU)."""
    return jnp.sum(v[..., :, None] * M * w[..., None, :], axis=(-2, -1))


def mm(A, B):
    """(..., m, k) @ (..., k, n) -> (..., m, n) in exact f32 (VPU)."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def xtwx(X, w):
    """X.T @ diag(w) @ X for X (r, n), w (r,) -> (n, n) in exact f32."""
    return jnp.sum(X[:, :, None] * (w[:, None, None] * X[:, None, :]), axis=0)
