"""Model construction + checkpoint loading for the CLIs and pipelines.

Equivalent of the reference's load_model_from_config
(scripts/inference.py:58-75): build from YAML, overlay a (converted) torch
checkpoint with strict=False semantics, report missing/unexpected keys.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pbe_tpu.convert import convert_state_dict, load_torch_checkpoint
from pbe_tpu.convert.torch_ckpt import validate_against
from pbe_tpu.models.pbe import PaintByExample, build_from_yaml
from pbe_tpu.pipelines.inference import EditPipeline
from pbe_tpu.training.partition import count_params


def init_variables(model: PaintByExample, seed: int = 0) -> dict:
    """Initialize the full parameter tree. Spatial dims don't affect conv
    param shapes, so init runs on a small 64x64 canvas; the CLIP image size
    is fixed by its position embeddings."""
    rng = jax.random.PRNGKey(seed)
    clip_size = model.cond_config.clip.image_size if model.cond_config.clip else 224
    image = jnp.zeros((1, 64, 64, 3), model.dtype)
    mask = jnp.ones((1, 64, 64, 1), model.dtype)
    ref = jnp.zeros((1, clip_size, clip_size, 3), model.dtype)
    return jax.jit(
        lambda r: model.init(
            {"params": r}, image, mask, ref, r,
            method=PaintByExample.initialize_all,
        )
    )(rng)


def randomize_zero_params(variables: dict, seed: int = 0,
                          scale: float = 0.1) -> dict:
    """Replace every all-zero float leaf with seeded gaussian noise*scale.

    The UNet's eps head, every ResBlock out-conv, and every transformer
    proj_out are zero-init (models/unet.py, reference zero_module parity:
    openaimodel.py:163-275), so a random-INIT model computes eps == 0 and
    every sampler trajectory from a given x_T is identical — any bench
    built on init_variables alone measures a constant-zero function (the
    round-4 quant-drift / tiling-seam trap). JAX port of the test suite's
    _randomize_zero_params (tests/test_full_model_parity.py)."""
    import numpy as np

    leaves, treedef = jax.tree.flatten(variables)
    g = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        a = np.asarray(leaf)
        if np.issubdtype(a.dtype, np.floating) and a.size and not np.any(a):
            a = (g.standard_normal(a.shape) * scale).astype(a.dtype)
        out.append(jnp.asarray(a))
    return jax.tree.unflatten(treedef, out)


def eps_rms_probe(model: PaintByExample, variables: dict,
                  height: int = 512, width: int = 512,
                  seed: int = 0) -> float:
    """RMS of one eps prediction on random inputs at the edit geometry.

    Benches on random-init weights must assert this clears a threshold
    (e.g. > 1e-3) before timing/measuring, or they are measuring the
    zero-init eps head (see randomize_zero_params)."""
    f = model.latent_downsample
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x9 = jax.random.normal(
        k1, (1, height // f, width // f, 9), model.dtype)
    ctx = jax.random.normal(k2, (1, 1, 768), model.dtype)
    t = jnp.array([500], jnp.int32)
    eps = jax.jit(
        lambda v, x, tt, c: model.apply(v, x, tt, c,
                                        method=PaintByExample.apply_model)
    )(variables, x9, t, ctx)
    return float(jnp.sqrt(jnp.mean(jnp.square(eps.astype(jnp.float32)))))


def overlay_checkpoint(
    variables: dict, ckpt_path: str, verbose: bool = True,
    drop_torch_prefixes: tuple[str, ...] = (),
) -> dict:
    """strict=False load: converted keys replace initialized ones; missing
    keys keep their init values (ddpm.py:245-260 behavior).

    drop_torch_prefixes: torch keys starting with any of these are
    filtered out BEFORE conversion — ("model.",) reproduces the
    reference's --train_from_scratch (main.py:244-248: the diffusion
    UNet stays random-init, only frozen VAE/CLIP load)."""
    import flax.traverse_util as traverse

    sd = load_torch_checkpoint(ckpt_path)
    if drop_torch_prefixes:
        pre = tuple(drop_torch_prefixes)
        sd = {k: v for k, v in sd.items() if not k.startswith(pre)}
    converted, dropped = convert_state_dict(sd)
    _maybe_expand_conv_in(converted, variables)
    missing, unexpected, mismatched = validate_against(
        converted["params"], variables["params"]
    )
    if mismatched:
        raise ValueError(f"shape mismatches loading {ckpt_path}: {mismatched[:5]}")
    if verbose:
        print(
            f"Restored from {ckpt_path}: {len(missing)} missing, "
            f"{len(unexpected)} unexpected, {len(dropped)} dropped torch keys"
        )
        if missing:
            print(f"  missing (kept init): {missing[:8]}")
    flat = dict(traverse.flatten_dict(variables["params"]))
    conv_flat = traverse.flatten_dict(converted["params"])
    for k, v in conv_flat.items():
        if k in flat:
            flat[k] = jnp.asarray(v, flat[k].dtype)
    return {"params": traverse.unflatten_dict(flat)}


def _maybe_expand_conv_in(converted: dict, variables: dict) -> None:
    """9-channel surgery: a plain SD-v1 checkpoint has a 4-channel first conv;
    pad the extra 5 input channels (masked-source latents + mask) with zeros
    (scripts/modify_checkpoints.py:1-6 semantics, kernel layout kHkWIO here)."""
    import numpy as np

    try:
        got = converted["params"]["model"]["input_blocks_0_0"]["kernel"]
        want = variables["params"]["model"]["input_blocks_0_0"]["kernel"]
    except KeyError:
        return
    if got.shape[2] < want.shape[2] and got.shape[:2] == want.shape[:2]:
        pad = np.zeros(
            got.shape[:2] + (want.shape[2] - got.shape[2],) + got.shape[3:],
            got.dtype,
        )
        converted["params"]["model"]["input_blocks_0_0"]["kernel"] = (
            np.concatenate([np.asarray(got), pad], axis=2)
        )
        print(
            f"expanded first conv input channels {got.shape[2]} -> "
            f"{want.shape[2]} with zeros (SD -> PBE 9-channel surgery)"
        )


def load_pipeline(
    config_path: str,
    ckpt_path: str | None = None,
    dtype: Any = jnp.bfloat16,
    attn_impl: str | None = None,
    seed: int = 0,
    verbose: bool = True,
    quantize: str | None = None,
    tiling=None,
    quant_scales: tuple | None = None,
) -> tuple[EditPipeline, dict]:
    """Build model from YAML (+ optional torch ckpt) -> (pipeline, raw_cfg).

    quantize="int8": serve with w8a8 UNet matmuls/convs (ops/quant.py) —
    opt-in; weights stay fp32, quantization happens in-program.
    quant_scales: calibrated static scales (EditPipeline.calibrate_int8)
    — constant-scale PTQ execution, no runtime amax (PERF.md §8).
    tiling: optional ops.tiling.TilingSpec — run every UNet eps call over
    latent crops (reference split_input_params, latent_diffusion.py:656-736);
    PERF.md §6 says when (if ever) this is worth it."""
    if attn_impl is None:
        from pbe_tpu.ops.attention import default_attn_impl

        attn_impl = default_attn_impl()
    model, raw = build_from_yaml(config_path, dtype=dtype, attn_impl=attn_impl,
                                 remat=False)
    variables = init_variables(model, seed=seed)
    if ckpt_path:
        variables = overlay_checkpoint(variables, ckpt_path, verbose=verbose)
    elif verbose:
        print(
            "WARNING: no checkpoint given — running with randomly initialized "
            "weights (outputs will not be meaningful edits)"
        )
    if verbose:
        print(f"model parameters: {count_params(variables) / 1e6:.1f}M")
    return EditPipeline(model, variables, quantize=quantize,
                        tiling=tiling, quant_scales=quant_scales), raw
