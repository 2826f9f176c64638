"""End-to-end exemplar-guided edit pipeline, fully jitted.

One compiled XLA program per (batch, image size, step count, sampler) covers
the whole edit: VAE-encode the masked source, CLIP-encode the exemplar,
run the S-step CFG sampler scan, VAE-decode — zero host round-trips inside
(the reference runs this as ~102 separate CUDA dispatch regions from Python:
scripts/inference.py:305-346).

Guidance scale is a traced scalar: changing it does NOT recompile — except
the scale == 1 case, which is specialized at trace time to a single
(non-doubled) UNet call per step, halving the FLOPs of an unguided edit
(the reference always pays the 2x-batched CFG forward; its own uc=None
fast path, plms.py:183-184, is unreachable from scripts/inference.py:323
whenever scale != 1).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.models.pbe import PaintByExample
from pbe_tpu.samplers import ddim_sample, ddpm_ancestral_sample, plms_sample
from pbe_tpu.schedules import SamplerSchedule


class EditPipeline:
    """Holds (model, variables) and a cache of compiled edit functions."""

    def __init__(self, model: PaintByExample, variables: dict,
                 quantize: str | None = None, tiling=None,
                 quant_scales: tuple | None = None):
        self.model = model
        self.variables = variables
        # "int8": trace edit programs with w8a8 matmuls/convs in the UNet
        # (ops/quant.py) — opt-in serving mode, ~2x on the eligible convs
        self.quantize = quantize
        # calibrated static scales (standard PTQ deployment): tuple from
        # calibrate_int8() — quantize/rescale become constant-scale
        # elementwise ops, no runtime amax (PERF.md §8)
        if quant_scales is not None and quantize != "int8":
            raise ValueError("quant_scales requires quantize='int8'")
        self.quant_scales = quant_scales
        # tiling: optional ops.tiling.TilingSpec (LATENT-space ks/stride) —
        # the reference's split_input_params path (latent_diffusion.py:
        # 656-736): every UNet eps call runs over overlapping latent crops
        # folded into the batch, stitched with border weighting. Changes
        # the math (per-crop attention; seams) — PERF.md §6 quantifies
        # when the FLOP saving is worth it at 1024². Off by default, like
        # the reference config (split_input_params is never set in v1).
        self.tiling = tiling
        self._fns: dict[tuple, Any] = {}
        self._batch_sharding = None

    @property
    def ref_size(self) -> int:
        """Exemplar side length the deployed CLIP tower expects (224 for
        the production ViT-L/14; tiny test configs differ)."""
        try:
            return self.model.cond_config.clip.image_size
        except AttributeError:
            return 224

    def shard(self, mesh=None) -> "EditPipeline":
        """Enable multi-chip batch serving: params replicated over a data
        mesh, inputs sharded on the batch axis; XLA partitions the whole edit
        program (the multi-chip serving sharding from BASELINE configs)."""
        from pbe_tpu.parallel import batch_sharding, make_mesh, replicated

        mesh = mesh or make_mesh()
        self.variables = jax.device_put(self.variables, replicated(mesh))
        self._batch_sharding = batch_sharding(mesh)
        self._replicated = replicated(mesh)
        return self

    # -- jitted body --------------------------------------------------------
    def _build(self, steps: int, sampler: str, eta: float, cfg: bool = True,
               paste: int = -1, det_first_stage: bool = False,
               out: str = "float32"):
        # the ancestral sampler walks the full DDPM chain and has no use for
        # the DDIM subsequence tables
        sched = (
            SamplerSchedule.create(self.model.schedule, steps, eta=eta)
            if sampler in ("plms", "ddim") else None
        )
        model = self.model

        @functools.partial(jax.jit, donate_argnums=())
        def run(variables, image, mask, ref, x_T, scale, rng):
            r_enc, r_sample = jax.random.split(rng)
            inpaint = image * mask
            z_inpaint = model.apply(
                variables, inpaint, None if det_first_stage else r_enc,
                method=PaintByExample.encode_first_stage,
            )
            hw = z_inpaint.shape[1:3]
            m_lat = jax.image.resize(
                mask, (mask.shape[0], *hw, 1), "bilinear"
            ).astype(z_inpaint.dtype)
            c = model.apply(variables, ref, method=PaintByExample.get_conditioning)

            tiling = self.tiling

            if tiling is None:
                def apply_fn(x9, t, ctx):
                    return model.apply(
                        variables, x9, t, ctx,
                        method=PaintByExample.apply_model,
                    )
            else:
                from pbe_tpu.ops.tiling import tiled_apply

                def apply_fn(x9, t, ctx):
                    # unfold stacks crops on a new leading axis then folds
                    # them into the batch (crop-major), so t/ctx repeat
                    # whole-batch blocks L times (jnp.tile, not repeat)
                    def inner(patches):
                        reps = patches.shape[0] // x9.shape[0]
                        return model.apply(
                            variables, patches, jnp.tile(t, (reps,)),
                            jnp.tile(ctx, (reps, 1, 1)),
                            method=PaintByExample.apply_model,
                        )

                    return tiled_apply(inner, x9, tiling)

            if cfg:
                uc = model.apply(
                    variables, image.shape[0], method=PaintByExample.uncond_vector
                )
                # scale is traced: build the CFG closure with symbolic scale
                ctx2 = jnp.concatenate([uc.astype(c.dtype), c], axis=0)

                def eps_fn(x9, t):
                    e = apply_fn(
                        jnp.concatenate([x9, x9], 0), jnp.concatenate([t, t], 0), ctx2
                    )
                    e_uc, e_c = jnp.split(e, 2, axis=0)
                    return e_uc + scale * (e_c - e_uc)
            else:
                # scale == 1 specialization: guidance is a no-op, run the UNet
                # once per step at batch B instead of 2B
                def eps_fn(x9, t):
                    return apply_fn(x9, t, c)

            if sampler == "plms":
                x0 = plms_sample(eps_fn, sched, x_T, z_inpaint, m_lat)
            elif sampler == "ddim":
                x0 = ddim_sample(
                    eps_fn, sched, x_T, z_inpaint, m_lat,
                    rng=r_sample if eta > 0 else None,
                )
            elif sampler == "ddpm":
                # full-chain ancestral sampling; `steps` is ignored (all T)
                x0 = ddpm_ancestral_sample(
                    eps_fn, model.schedule, x_T, z_inpaint, m_lat, r_sample
                )
            else:
                raise ValueError(f"unknown sampler {sampler!r}")
            if out == "latent":
                # pre-decode diagnostic output: the sampled latent x0 —
                # used by drift/accuracy benches (e.g. int8-vs-fp bounds)
                # that need error in latent space, before the VAE decode
                return x0.astype(jnp.float32)
            img = model.apply(
                variables, x0, method=PaintByExample.decode_first_stage
            )
            img01 = jnp.clip((img.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
            if paste >= 0:
                # detail-preserving composite (vae_asym.paste_back): original
                # pixels wherever mask==1, feathered seam into the edit —
                # stays inside the compiled program, so it is HBM-free
                from pbe_tpu.models.vae_asym import paste_back

                orig01 = (image.astype(jnp.float32) + 1.0) / 2.0
                img01 = paste_back(
                    img01, orig01, mask.astype(jnp.float32), feather=paste
                )
            if out == "uint8":
                # device-side PNG-ready output: matches the host formula in
                # data/transforms.to_uint8 (clip -> *255 -> round-half-even)
                # and cuts the D2H readback 4x vs float32
                return jnp.round(
                    jnp.clip(img01, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return img01

        return run

    def _fn(self, steps: int, sampler: str, eta: float, cfg: bool,
            paste: int = -1, det_first_stage: bool = False,
            out: str = "float32"):
        # explicit build-args tuple: the cache key is build_args plus the
        # pipeline-level modes _build reads from self, so appending a new
        # key element can never silently shift what _build receives
        build_args = (steps, sampler, eta, cfg, paste, det_first_stage, out)
        key = build_args + (self.quantize, self.quant_scales, self.tiling)
        if key not in self._fns:
            self._fns[key] = self._build(*build_args)
        return self._fns[key]

    # -- public API ---------------------------------------------------------
    def edit_batch(
        self,
        image: np.ndarray,
        mask: np.ndarray,
        ref: np.ndarray,
        *,
        steps: int = 50,
        scale: float = 5.0,
        sampler: str = "plms",
        eta: float = 0.0,
        seed: int = 42,
        x_T: np.ndarray | None = None,
        paste_back: int | None = None,
        det_first_stage: bool = False,
        output: str = "float32",
        block: bool = True,
    ) -> np.ndarray:
        """image (B,H,W,3) in [-1,1]; mask (B,H,W,1) 1=keep; ref (B,224,224,3)
        CLIP-normalized. Returns (B,H,W,3) float32 in [0,1] (or uint8 in
        [0,255] with ``output="uint8"``).

        paste_back: None (reference-parity full decode) or a feather radius
        in pixels — composite the original pixels back outside the mask
        (bit-exact detail preservation; 0 = hard seam).
        det_first_stage: use the VAE posterior mode instead of sampling for
        the masked-source latent (reference samples per
        latent_diffusion.py:255-262; mode makes the edit batch-size- and
        padding-invariant).
        output: "uint8" converts on device with the exact
        data/transforms.to_uint8 formula — a 4x smaller readback for
        results whose destination is a PNG anyway.
        block: False returns the (trimmed) device array without waiting —
        JAX dispatch is asynchronous, so the caller can overlap the next
        batch's host work with this batch's device time and read back
        later with np.asarray()."""
        b, h, w, _ = image.shape
        f = self.model.latent_downsample
        rng = jax.random.PRNGKey(seed)
        if x_T is None:
            rng, r_xt = jax.random.split(rng)
            x_T = jax.random.normal(
                r_xt, (b, h // f, w // f, 4), self.model.dtype
            )
        if output not in ("float32", "uint8", "latent"):
            raise ValueError(f"output must be 'float32', 'uint8' or "
                             f"'latent', got {output!r}")
        fn = self._fn(int(steps), sampler, float(eta), float(scale) != 1.0,
                      -1 if paste_back is None else int(paste_back),
                      bool(det_first_stage), output)
        args = [
            jnp.asarray(image, self.model.dtype),
            jnp.asarray(mask, self.model.dtype),
            jnp.asarray(ref, self.model.dtype),
            jnp.asarray(x_T, self.model.dtype),
        ]
        if self._batch_sharding is not None:
            # ragged final batches: pad to a multiple of the mesh size by
            # repeating the last example (batch sharding needs divisibility),
            # trim the padded rows off the output below
            n = self._batch_sharding.mesh.size
            pad = (-b) % n
            if pad:
                args = [
                    jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], 0)
                    for a in args
                ]
            args = [jax.device_put(a, self._batch_sharding) for a in args]
        from pbe_tpu.ops import conv as conv_ops
        from pbe_tpu.ops import quant

        qkw = {"static": self.quant_scales} if self.quant_scales else {}
        with quant.quantized(self.quantize, **qkw), conv_ops.small_spatial():
            # the contexts matter only while jit traces (first call per
            # config); compiled executions are unaffected by them.
            # small_spatial: exact im2col rewrite of the deep-level UNet
            # convs (1.4-1.7x those convs on-chip, PERF.md §5/§9); int8
            # mode overrides it for the convs it quantizes
            out = fn(
                self.variables, *args, jnp.asarray(scale, jnp.float32), rng,
            )
        if not block:
            return out[:b] if out.shape[0] != b else out
        return np.asarray(out)[:b]

    def edit(self, image, mask, ref, **kw) -> np.ndarray:
        """Single-example convenience; HWC in, HWC out."""
        out = self.edit_batch(image[None], mask[None], ref[None], **kw)
        return out[0]

    def calibrate_int8(self, image, mask, ref, n_t: int = 8,
                       seed: int = 0) -> tuple:
        """Calibrate static w8a8 scales (standard post-training
        quantization) on representative edit inputs.

        Records per-op activation/weight amax of the CFG-doubled UNet
        call at ``n_t`` timesteps spread across the schedule, with x_t
        drawn from the forward process q(x_t | z0) around the encoded
        source image — the same input statistics the sampler's eps calls
        see (latent assembly per latent_diffusion.py:383-390). Returns
        the static-scales tuple for ``EditPipeline(quantize="int8",
        quant_scales=...)``; scales are input-independent at serve time,
        so batch invariance is trivial and no runtime amax reduction is
        traced (PERF.md §8). Inputs: NHWC arrays shaped like a serving
        batch (scale values track amax maxima, so a handful of examples
        suffices)."""
        from pbe_tpu.ops import quant

        model = self.model
        sched = model.schedule
        sqrt_a = jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32)
        sqrt_1ma = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod,
                               jnp.float32)

        @jax.jit
        def calib(variables, image, mask, ref, t, rng):
            r_enc, r_noise = jax.random.split(rng)
            z, z_inpaint, m = model.apply(
                variables, image, image * mask, mask, r_enc,
                method=PaintByExample.prepare_latents)
            c = model.apply(variables, ref,
                            method=PaintByExample.get_conditioning)
            uc = model.apply(variables, image.shape[0],
                             method=PaintByExample.uncond_vector)
            ctx2 = jnp.concatenate([uc.astype(c.dtype), c], axis=0)
            noise = jax.random.normal(r_noise, z.shape, z.dtype)
            a = sqrt_a[t].astype(z.dtype)
            s = sqrt_1ma[t].astype(z.dtype)
            x_t = a * z + s * noise
            x9 = jnp.concatenate([x_t, z_inpaint, m], axis=-1)
            x18 = jnp.concatenate([x9, x9], axis=0)
            t2 = jnp.full((x18.shape[0],), t, jnp.float32)
            with quant.calibration() as col:
                model.apply(variables, x18, t2, ctx2,
                            method=PaintByExample.apply_model)
            return col.records

        n_steps = len(sched.alphas_cumprod)
        image = jnp.asarray(image, self.model.dtype)
        mask = jnp.asarray(mask, self.model.dtype)
        ref = jnp.asarray(ref, self.model.dtype)
        recs = []
        for i, t in enumerate(
                np.linspace(0, n_steps - 1, n_t).round().astype(np.int32)):
            r = calib(self.variables, image, mask, ref,
                      jnp.asarray(t, jnp.int32),
                      jax.random.PRNGKey(seed + i))
            recs.append(jax.tree_util.tree_map(np.asarray, r))
        return quant.scales_from_records(recs)
