"""Image gradients and the modified-algorithm boundary band.

Central differences with zero at the one-pixel border, plus the "modified
inverse compositional" image-domain improvement: a band of `delta` pixels
around the border is excluded from the estimation (the reference marks it
NaN — src/inverse_compositional_algorithm.py:81-93, tf twin
src/keras-tf/tf_inverse_compositional_algorithm.py:19-37; we return an
explicit mask instead, see ops/warp.py design notes).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["central_gradients", "boundary_band_mask"]


def central_gradients(image):
    """Central-difference dI/dx, dI/dy of a batch of images.

    Args:
      image: [B, H, W, C].

    Returns:
      (ix, iy): [B, H, W, C] each; 0.5*(I[i+1] - I[i-1]) in the interior and
      zero on the first/last row/column, matching reference
      src/inverse_compositional_algorithm.py:81-82 and `tf_compute_gradients`
      (src/keras-tf/tf_derivatives.py:19-25).
    """
    ix = 0.5 * (image[:, :, 2:, :] - image[:, :, :-2, :])
    ix = jnp.pad(ix, ((0, 0), (0, 0), (1, 1), (0, 0)))
    iy = 0.5 * (image[:, 2:, :, :] - image[:, :-2, :, :])
    iy = jnp.pad(iy, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return ix, iy


def boundary_band_mask(height: int, width: int, delta: int, *, y_offset: int = 0,
                       full_height: int | None = None):
    """[height, width] float mask: 0 in the delta-band near the image border.

    Static (shape-only) data, built in numpy so it folds into the compiled
    program as a constant. `y_offset`/`full_height` let a row-sharded caller
    build the mask for its tile with *global* boundaries, which is the
    correctness subtlety of spatial sharding (SURVEY §5: the delta band must
    respect global, not shard-local, edges).
    """
    fh = full_height if full_height is not None else height
    rows = np.arange(y_offset, y_offset + height)
    cols = np.arange(width)
    rok = (rows >= delta) & (rows < fh - delta)
    cok = (cols >= delta) & (cols < width - delta)
    return jnp.asarray((rok[:, None] & cok[None, :]).astype(np.float32))
