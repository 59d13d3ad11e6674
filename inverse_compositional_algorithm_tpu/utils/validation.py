"""Numerical hygiene helpers (reference: src/utils.py:3-18)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["valid_values"]


def valid_values(array) -> bool:
    """True iff the array contains no NaN or Inf (host-side check)."""
    return bool(jnp.all(jnp.isfinite(jnp.asarray(array))))
