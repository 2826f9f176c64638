"""Frozen edit programs: serialize the traced edit pipeline to StableHLO.

Production deployment path with no reference counterpart (the reference
ships python model code to every host): ``export_edit_program`` traces the
pipeline's fused edit function once and serializes it (jax.export), so a
serving host reconstructs the exact program from bytes — no flax, no model
code, no config — and runs it with parameters passed at call time.
Parameters stay OUT of the artifact on purpose: baking 3.4 GB of weights
into StableHLO constants would bloat the blob and (over the remote-compile
tunnel) the compile request; ship them as an Orbax/npz checkpoint instead.

XLA still compiles the loaded program on the target (the persistent
compilation cache in utils/cache.py makes that a one-time cost per
geometry); what the artifact removes is python-side tracing and the model
stack as a deployment dependency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def export_edit_program(
    pipeline,
    *,
    batch: int,
    height: int = 512,
    width: int = 512,
    steps: int = 50,
    sampler: str = "plms",
    eta: float = 0.0,
    cfg: bool = True,
    paste_back: int | None = None,
    det_first_stage: bool = False,
) -> bytes:
    """Trace one edit configuration at a fixed geometry -> StableHLO bytes.

    The exported callable's signature is
    ``(variables, image, mask, ref, x_T, scale, rng) -> img01`` — identical
    to the jitted body EditPipeline dispatches (inference.py `_build`).

    Compositions: a ``quantize="int8"`` pipeline exports the QUANTIZED
    program (the trace runs inside the quantized() context, exactly as
    edit_batch would); a ``pipeline.shard(mesh)`` pipeline exports a
    PARTITIONED program (avals carry the batch/replicated shardings, so
    the artifact runs on any mesh of the same size and the loaded call
    keeps the multi-chip layout).
    """
    from jax import export as jexport

    fn = pipeline._fn(int(steps), sampler, float(eta), bool(cfg),
                      -1 if paste_back is None else int(paste_back),
                      bool(det_first_stage))
    model = pipeline.model
    dt = model.dtype
    f = model.latent_downsample
    ref_size = pipeline.ref_size

    bs = getattr(pipeline, "_batch_sharding", None)
    rep = getattr(pipeline, "_replicated", None)

    def _aval(shape, dtype, sharding):
        if sharding is None:
            return jax.ShapeDtypeStruct(shape, dtype)
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    if bs is not None and batch % bs.mesh.size != 0:
        raise ValueError(
            f"sharded export needs batch ({batch}) divisible by the mesh "
            f"size ({bs.mesh.size}) — padding is a dispatch-time concern, "
            "a frozen program has one shape")
    avals = (
        jax.tree.map(lambda x: _aval(x.shape, x.dtype, rep),
                     pipeline.variables),
        _aval((batch, height, width, 3), dt, bs),
        _aval((batch, height, width, 1), dt, bs),
        _aval((batch, ref_size, ref_size, 3), dt, bs),
        _aval((batch, height // f, width // f, 4), dt, bs),
        _aval((), jnp.float32, rep),
        _aval((2,), jnp.uint32, rep),  # PRNGKey(0)'s layout
    )
    from pbe_tpu.ops import conv as conv_ops
    from pbe_tpu.ops import quant

    scales = getattr(pipeline, "quant_scales", None)
    qkw = {"static": scales} if scales else {}
    with quant.quantized(getattr(pipeline, "quantize", None), **qkw), \
            conv_ops.small_spatial():
        # trace-time: an int8 pipeline freezes its w8a8 program, not the
        # fp one (same contexts edit_batch uses — incl. the exact
        # small-spatial im2col conv rewrite, so the frozen program is the
        # same program the live pipeline runs); calibrated static scales
        # serialize as constants in the StableHLO — the deployed artifact
        # carries the PTQ grid with it
        exported = jexport.export(fn)(*avals)
    return bytes(exported.serialize())


# Runtime-side loading lives in pbe_tpu.export_runtime (a light top-level
# module that does not drag the model stack onto serving hosts); re-export
# for convenience of same-process use.
from pbe_tpu.export_runtime import (  # noqa: E402,F401
    load_edit_program,
    load_edit_program_file,
    save_edit_program,
)
