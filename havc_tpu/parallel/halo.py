"""Halo exchange for spatially-sharded stencil ops (convs, blurs, resizes).

Frame-data-parallelism covers the classic pipeline (frames independent),
but HD spatial sharding — splitting H across the ``model`` axis — needs
neighbour rows for any op with a receptive field (round-1 gap: "spatial
model-axis sharding of conv models needs halo exchange that is neither
implemented nor tested").  This module provides it the TPU way:
``shard_map`` over the mesh with ``jax.lax.ppermute`` shipping halo rows
over ICI, edge replication at the true image borders, then the unmodified
local op runs on the haloed shard and crops.

``spatial_halo_call(mesh, fn, x, halo)`` turns ANY local op whose output
matches its input geometry (conv stacks, the Pallas post chain, NLM
windows...) into a spatially-sharded op with identical numerics to the
single-device version.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["halo_exchange_rows", "spatial_halo_call"]


def halo_exchange_rows(x_local: jnp.ndarray, halo: int, axis_name: str):
    """Extend a local (T, H_local, W, C) shard by ``halo`` rows from each
    spatial neighbour along ``axis_name`` (edge replication at the global
    top/bottom).  Returns (T, H_local + 2*halo, W, C)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    down_perm = [(i, i + 1) for i in range(n - 1)]
    up_perm = [(i + 1, i) for i in range(n - 1)]
    # rows arriving from the shard ABOVE (its bottom rows)
    from_above = jax.lax.ppermute(x_local[:, -halo:], axis_name, down_perm)
    # rows arriving from the shard BELOW (its top rows)
    from_below = jax.lax.ppermute(x_local[:, :halo], axis_name, up_perm)

    # boundary shards received zeros (no source in the permute) — replicate
    # their own edge rows instead, matching the single-device edge behavior
    top_edge = jnp.repeat(x_local[:, :1], halo, axis=1)
    bottom_edge = jnp.repeat(x_local[:, -1:], halo, axis=1)
    from_above = jnp.where(idx == 0, top_edge, from_above)
    from_below = jnp.where(idx == n - 1, bottom_edge, from_below)
    return jnp.concatenate([from_above, x_local, from_below], axis=1)


def spatial_halo_call(
    mesh: Mesh,
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    halo: int,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Build a jitted spatially-sharded version of a local op.

    ``fn`` maps (T, H, W, C) -> (T, H, W, C) with a receptive field of at
    most ``halo`` rows (edge-padding semantics at borders).  The returned
    callable takes a global (T, H, W, C) batch, shards frames over
    ``data_axis`` and rows over ``model_axis``, exchanges halos over ICI,
    applies ``fn`` per shard, and crops — numerically identical to
    ``fn`` on one device for edge-padded ops.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(data_axis, model_axis)

    def local(x_local):
        ext = halo_exchange_rows(x_local, halo, model_axis)
        out = fn(ext)
        return out[:, halo:-halo]

    try:
        sharded = shard_map(
            local, mesh=mesh, in_specs=(spec,), out_specs=spec
        )
    except TypeError:  # older keyword API
        sharded = shard_map(
            local, mesh, in_specs=(spec,), out_specs=spec
        )
    return jax.jit(
        sharded,
        in_shardings=(NamedSharding(mesh, spec),),
        out_shardings=NamedSharding(mesh, spec),
    )
