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
    """
    from jax import export as jexport

    fn = pipeline._fn(int(steps), sampler, float(eta), bool(cfg),
                      -1 if paste_back is None else int(paste_back),
                      bool(det_first_stage))
    model = pipeline.model
    dt = model.dtype
    f = model.latent_downsample
    ref_size = pipeline.ref_size
    avals = (
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                     pipeline.variables),
        jax.ShapeDtypeStruct((batch, height, width, 3), dt),
        jax.ShapeDtypeStruct((batch, height, width, 1), dt),
        jax.ShapeDtypeStruct((batch, ref_size, ref_size, 3), dt),
        jax.ShapeDtypeStruct((batch, height // f, width // f, 4), dt),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),  # PRNGKey(0)'s layout
    )
    return bytes(jexport.export(fn)(*avals).serialize())


# Runtime-side loading lives in pbe_tpu.export_runtime (a light top-level
# module that does not drag the model stack onto serving hosts); re-export
# for convenience of same-process use.
from pbe_tpu.export_runtime import (  # noqa: E402,F401
    load_edit_program,
    load_edit_program_file,
    save_edit_program,
)
