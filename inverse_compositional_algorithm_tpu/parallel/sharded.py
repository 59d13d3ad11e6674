"""Mesh-sharded alignment: data parallelism over pairs (+ optional row tiling).

`align_sharded` is the scale-out twin of models.api.align: the same compiled
pipeline, pjit-ed over a ("pairs", "tile") mesh. Every per-pair quantity
(images, parameters, errors, convergence flags) shards over the pairs axis,
so the per-pair convergence masking from models/ic.py carries over unchanged
— thousands of keyframe registrations run concurrently, each stopping on its
own criterion. XLA inserts the (trivial) collectives; with tile > 1 the
row-sharded images additionally spread the bandwidth-bound moment
computations, with the 8x8 normal equations reduced over ICI.

Multi-host: call `init_distributed()` first (jax.distributed), then build
the mesh over `jax.devices()` as usual — the global mesh spans hosts and
each host feeds its addressable shard of the pair batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import AlignConfig
from ..models.api import AlignResult, _align_impl
from ..ops.transforms import pad_params
from .mesh import Mesh, image_sharding, make_mesh, pair_sharding

__all__ = ["align_sharded", "init_distributed"]


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up (jax.distributed.initialize passthrough)."""
    jax.distributed.initialize(**kwargs)


def align_sharded(i1, i2, config: AlignConfig = AlignConfig(), p0=None,
                  mesh: Mesh | None = None, tile_rows: bool = False,
                  dtype=jnp.float32) -> AlignResult:
    """Align a batch of pairs sharded across the mesh.

    Args:
      i1, i2: [B, H, W, C]; B must divide by the mesh's pairs axis.
        Single-process: B is the global batch. Multi-process
        (jax.process_count() > 1): i1/i2/p0 are THIS PROCESS's shard of
        the batch (each host feeds different pairs; the global batch is
        B * process_count, assembled with
        jax.make_array_from_process_local_data).
      mesh: a ("pairs", "tile") mesh (default: all devices on pairs).
      tile_rows: also shard image rows over the tile axis.

    Returns:
      AlignResult with mesh-sharded leaves (use jax.device_get to fetch;
      multi-process callers see their addressable shards).
    """
    config.validate()
    if config.use_pallas and (jax.default_backend() != "tpu"
                              or dtype != jnp.float32):
        config = config.replace(use_pallas=False)
    if mesh is None:
        mesh = make_mesh()
    i1 = jnp.asarray(i1, dtype)
    i2 = jnp.asarray(i2, dtype)
    b = i1.shape[0]
    if p0 is None:
        p0 = jnp.zeros((b, 8), dtype)
    else:
        p0 = pad_params(jnp.asarray(p0, dtype))

    img_s = image_sharding(mesh, tile_rows=tile_rows)
    vec_s = pair_sharding(mesh)
    nproc = jax.process_count()
    if nproc > 1:
        import numpy as np

        def glob(x, sh):
            gshape = (x.shape[0] * nproc,) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x), gshape)

        i1, i2 = glob(i1, img_s), glob(i2, img_s)
        p0 = glob(p0, vec_s)
    else:
        i1, i2 = jax.device_put(i1, img_s), jax.device_put(i2, img_s)
        p0 = jax.device_put(p0, vec_s)

    fn = jax.jit(
        partial(_align_impl, config=config),
        in_shardings=(img_s, img_s, vec_s),
    )
    return fn(i1, i2, p0)
