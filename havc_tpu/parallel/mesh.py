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

__all__ = [
    "make_mesh",
    "shard_frames",
    "replicate",
    "sharded_pipeline_step",
    "sharded_engine_step",
    "sharded_classic_pipeline",
]


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


def sharded_engine_step(mesh: Mesh, config: str = "tiny", input_size: int = 64,
                        work: int = 64):
    """Full pipeline step with a REAL model engine under the mesh.

    This is what ``__graft_entry__.dryrun_multichip`` compiles: the DDColor
    forward (ConvNeXt encoder + color-query decoder — where the FLOPs are)
    runs **data-parallel over every device** (frame batch sharded over the
    flattened ``data x model`` axes, params replicated), then the chroma
    post chain is re-sharded **spatially** (frames on ``data``, height on
    ``model``) and a global-luma reduction forces a cross-device collective
    (``psum`` over both axes).  Mapping per SURVEY §2.5: frames are
    independent in the classic path, so DP is the natural scale-out; the
    spatial axis exercises the resharding the tiled/placebo paths use.

    Returns ``(step_fn, params)``; call as ``step_fn(params, frames)`` with
    ``frames`` of shape (T, H, W, 3), T divisible by the mesh size and H
    divisible by the ``model`` axis.
    """
    from ..models import ddcolor as dd
    from ..ops import merge as merge_ops
    from ..ops.pallas_kernels import post_chain_reference

    model = dd.DDColor.from_config(config)
    params = dd.init_params(model, input_size=input_size)

    batch_all = NamedSharding(mesh, P(("data", "model")))
    spatial = NamedSharding(mesh, P("data", "model"))
    repl = NamedSharding(mesh, P())

    post_kw = dict(
        dark_thr=0.1, dark_white=0.3, dark_sat=0.3, dark_bright=-0.8,
        sm_black=0.3, sm_white=0.7, sm_sat=0.9, sm_bright=0.0,
        cmap_ranges=((300.0, 360.0),), cmap_hue_shift=0.0, cmap_sat=0.8,
        cmap_weight=0.1,
    )

    def step(p, frames):
        colored = dd.colorize(p, frames, model, input_size=input_size)
        # merge against the (gray) input — method 2 SimpleMerge keeps the
        # dryrun compile light; heavier merges shard identically
        merged = merge_ops.combine_models(frames, colored, method=2, b_weight=0.5)
        # re-shard: frames on data, height on model (post ops are local)
        merged = jax.lax.with_sharding_constraint(merged, spatial)
        out = post_chain_reference(merged, **post_kw)
        out = jnp.clip(out, 0.0, 1.0)
        from ..ops.colorspace import luma

        global_luma = jnp.mean(luma(out))  # cross-device reduction
        return out, global_luma

    step_fn = jax.jit(
        step,
        in_shardings=(repl, batch_all),
        out_shardings=(spatial, repl),
    )
    return step_fn, params


def sharded_classic_pipeline(mesh: Mesh, do_encoder: str = "nano",
                             dd_config: str = "tiny", rf: int = 4,
                             input_size: int = 64):
    """The FULL classic colorize pipeline (BASELINE config #4) under a mesh:

        work resize -> DeOldify U-Net || DDColor -> ConstrainedChroma merge
        -> fused post chain -> full-res chroma restore

    — the program bench.py times on one chip, data-parallel over every
    device (frame batch sharded on the flattened data x model axes, both
    engines' params replicated).  Classic frames are independent, so the
    only ICI traffic is the trailing global-luma reduction; scaling is
    linear in chips until host decode saturates.

    Returns ``(step_fn, (do_params, dd_params))``; frames (T, H, W, 3) with
    T divisible by the mesh size.  Geometry arguments default to dev-scale
    (dryrun/CPU-mesh friendly); production uses encoder='resnet101',
    dd_config='large', rf=24, input_size=384 as in bench.py.
    """
    from ..filters import chroma_resize_restore
    from ..models import ddcolor as dd
    from ..models import deoldify as do
    from ..ops import merge as merge_ops
    from ..ops.pallas_kernels import post_chain_reference
    from ..ops.resize import resize

    dd_model = dd.DDColor.from_config(dd_config)
    do_model = do.DeOldifyWide(encoder=do_encoder, nf_factor=1)
    dd_params = dd.init_params(dd_model, input_size=input_size)
    do_params = do.init_params(do_model, input_size=input_size)
    work = rf * 16

    post_kw = dict(
        dark_thr=0.1, dark_white=0.3, dark_sat=0.3, dark_bright=-0.8,
        sm_black=0.3, sm_white=0.7, sm_sat=0.9, sm_bright=0.0,
        cmap_ranges=((300.0, 360.0),), cmap_hue_shift=0.0, cmap_sat=0.8,
        cmap_weight=0.1,
    )

    batch_all = NamedSharding(mesh, P(("data", "model")))
    repl = NamedSharding(mesh, P())

    def step(do_p, dd_p, frames):
        w = jnp.clip(resize(frames, work, work, "spline64"), 0.0, 1.0)
        stable = do.colorize(do_p, w, do_model, render_factor=rf)
        vivid = dd.colorize(dd_p, w, dd_model, input_size=input_size)
        merged = merge_ops.combine_models(stable, vivid, method=3,
                                          b_weight=0.5)
        tuned = post_chain_reference(merged, **post_kw)
        out = chroma_resize_restore(frames, tuned)
        from ..ops.colorspace import luma

        return out, jnp.mean(luma(out))

    step_fn = jax.jit(
        step,
        in_shardings=(repl, repl, batch_all),
        out_shardings=(batch_all, repl),
    )
    return step_fn, (do_params, dd_params)
