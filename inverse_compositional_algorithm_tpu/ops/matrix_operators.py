"""Per-pixel normal-equation operators (legacy L3 surface, batched).

The reference keeps a pre-einsum formulation of the Gauss-Newton
accumulations as per-pixel matrix products — `AtA`, `sAtA`, `Atb`, `sAtb`
(reference: src/matrix_operators.py:3-63, marked "decide if obsolete" and
unused by its drivers). They are provided here fully batched/vmapped for
API parity and as independent oracles for the channel-reduced fast path in
ops/normal_equations (which the solvers actually use): summing `ata`/`atb`
over pixels reproduces `hessian`/`rhs` exactly.

Also exposes `steepest_descent_images`, the materialized DIJ tensor of the
reference (src/image_optimisation.py:158-194 /
src/keras-tf/tf_image_optimisation.py:72-98). The production solvers never
build it (see ops/normal_equations module docstring for why); it exists for
diagnostics, parity, and tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from .transforms import TransformType, jacobian_fields

__all__ = ["steepest_descent_images", "ata", "sata", "atb", "satb"]


def steepest_descent_images(ix, iy, jx, jy):
    """DIJ[..., c, n] = Ix[..., c] * Jx[..., n] + Iy[..., c] * Jy[..., n].

    Args:
      ix, iy: [B, H, W, C] image gradients (boundary-band-masked).
      jx, jy: [H, W, 8] Jacobian fields (ops.transforms.jacobian_fields).

    Returns:
      [B, H, W, C, 8] — the reference's DIJ layout with the batch dim first
      (reference numpy shape is (ny, nx, nz, np), TF adds B in front).
    """
    return (ix[..., :, None] * jx[..., None, :]
            + iy[..., :, None] * jy[..., None, :])


def ata(dij):
    """Per-pixel A^T A of the steepest-descent vectors.

    dij: [..., C, N] -> [..., N, N]. Batched mirror of reference `AtA`
    (src/matrix_operators.py:3-9). Summed over leading pixel dims this is
    the (unweighted) Hessian.
    """
    return jnp.einsum("...cn,...cm->...nm", dij, dij)


def sata(rho, dij):
    """rho-weighted per-pixel A^T A (reference `sAtA`,
    src/matrix_operators.py:11-26). rho broadcasts over [..., N, N]."""
    return jnp.asarray(rho)[..., None, None] * ata(dij)


def atb(dij, di):
    """Per-pixel A^T b: [..., C, N], [..., C] -> [..., N] (reference `Atb`,
    src/matrix_operators.py:28-45). Summed over pixels this is the
    independent vector b."""
    return jnp.einsum("...cn,...c->...n", dij, di)


def satb(rho, dij, di):
    """rho-weighted per-pixel A^T b (reference `sAtb`,
    src/matrix_operators.py:47-63)."""
    return jnp.asarray(rho)[..., None] * atb(dij, di)
