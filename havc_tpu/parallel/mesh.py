"""Device-mesh sharding for multi-chip colorization.

The reference's only "distribution" is a localhost XML-RPC server pair and
CUDA streams (SURVEY 2.5); the TPU-native scale-out story is data-parallel
**frame sharding** over a ``jax.sharding.Mesh`` with replicated parameters:

* ``data`` axis: batches of frames split across chips (every frame is
  independent in the classic colorize path, so DP is embarrassingly
  parallel and collectives only appear in whole-clip reductions).
* ``model`` axis: reserved for sharding the large DDColor/DeOldify matmuls
  (activations sharded on channels); round-1 keeps params replicated and
  uses the axis for spatial (H) sharding of the post chain, where halo
  exchange is unnecessary because all post kernels are local.

Collectives ride ICI automatically when XLA partitions the jitted program;
host->HBM transfer overlaps compute via JAX async dispatch.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_frames", "replicate", "sharded_pipeline_step"]


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              model: int = 1, platform: Optional[str] = None) -> Mesh:
    """Build a (data x model) mesh over the available devices.

    When the default backend has fewer devices than requested, fall back to
    the host-platform virtual CPU devices (``--xla_force_host_platform_
    device_count``) so multi-chip programs can be validated on one host.
    """
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n and platform is None:
        cpu = jax.devices("cpu")
        if len(cpu) >= n:
            devs = cpu
    devs = devs[:n]
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    if data is None:
        data = n // model
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_frames(x, mesh: Mesh):
    """Place a (T, H, W, C) batch with frames split over the data axis and
    height split over the model axis (spatial sharding)."""
    return jax.device_put(x, NamedSharding(mesh, P("data", "model")))


def replicate(tree, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_pipeline_step(mesh: Mesh, method: int = 3):
    """Build the jitted multi-chip pipeline step.

    One full "HAVC step" over a frame batch: two stand-in colorizer paths
    (stable chroma clamp + vivid), merge method, chroma post chain —
    sharded (frames x height) over (data x model).  The real model engines
    plug in identically (their batch axis shards on ``data``); this step is
    what ``dryrun_multichip`` compiles to validate the sharding story.
    """
    from ..ops import merge as merge_ops
    from ..ops.chroma import tweak
    from ..ops.colorspace import rgb_to_yuv, yuv_to_rgb_preserve_luma

    def tint(x, du, dv):
        yuv = rgb_to_yuv(x)
        return yuv_to_rgb_preserve_luma(
            jnp.stack([yuv[..., 0], yuv[..., 1] + du, yuv[..., 2] + dv], -1)
        )

    def step(frames):
        stable = tint(frames, -0.02, 0.04)
        vivid = tint(frames, 0.05, -0.03)
        merged = merge_ops.combine_models(stable, vivid, method=method, b_weight=0.5)
        out = tweak(merged, sat=1.05)
        out = jnp.clip(out, 0.0, 1.0)
        # a cross-device reduction (global mean luma) to exercise ICI
        from ..ops.colorspace import luma

        global_luma = jnp.mean(luma(out))
        return out, global_luma

    in_sharding = NamedSharding(mesh, P("data", "model"))
    return jax.jit(
        step,
        in_shardings=(in_sharding,),
        out_shardings=(in_sharding, NamedSharding(mesh, P())),
    )
