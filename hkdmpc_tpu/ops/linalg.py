"""TPU-friendly small-matrix linear algebra.

`jnp.linalg.cholesky` / `inv` lower to LAPACK-style row-sequential loops that
map poorly onto the TPU vector units, and they dominate the Riccati backward
sweep (one 24x24 factorization per step per scenario). `sweep_inverse`
replaces both with the symmetric sweep operator: n rank-1 updates of the full
matrix — pure outer products and elementwise ops that vectorize perfectly
over scenario batches, and whose pivots double as the positive-definiteness
check (the pivots of the pivot-free symmetric elimination are the LDLT
diagonal, so `all(pivots > eps)` reproduces the reference's
`chol(Quu - 1e-9 I).isPositive()` gate, SinglePhase.cpp:337-341).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def sweep_inverse(M, pd_shift: float = 1e-9):
    """Invert a symmetric positive-definite matrix via the sweep operator.

    Returns (M_inv, is_pd). On a non-PD input, is_pd is False and the
    returned matrix is garbage (finite) — callers must gate on the flag,
    exactly as with the Cholesky-check-then-invert pattern it replaces.
    """
    n = M.shape[-1]
    dtype = M.dtype
    eye = jnp.eye(n, dtype=dtype)

    def body(k, carry):
        W, ok = carry
        e = eye[k]
        row = W[k]                      # (n,) current k-th row
        col = W[:, k]
        d = row[k]
        ok = jnp.logical_and(ok, d > pd_shift)
        d_safe = jnp.where(jnp.abs(d) > 1e-30, d, jnp.asarray(1.0, dtype))
        W = (W - jnp.outer(col - e, row - e) / d_safe
             - 2.0 * jnp.outer(e, e))
        return W, ok

    W, ok = lax.fori_loop(0, n, body, (M, jnp.array(True)))
    return -W, ok
