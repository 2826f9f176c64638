"""The jitted training step.

Implements the reference training semantics (latent_diffusion.py:612-634 and
763-809) in one pure function:

  * frozen VAE encodes GT + masked source with posterior *sampling* per step
    (get_input, latent_diffusion.py:371-390; sampling at :255-262)
  * 9-channel latent assembly; noise applied to channels 0:4 only, the
    conditioning channels 4:9 re-concatenated (p_losses :763-767)
  * exemplar conditioning through the trainable mapper tail + proj_out
    (:624-625); with probability u_cond_percent the whole batch's condition
    is swapped for the learnable vector (:631-634 — the reference draws one
    uniform per step, not per example)
  * eps-MSE loss with per-timestep logvar weighting (zeros in v1) and the
    0-weighted VLB term kept as a metric (:783-807)
  * AdamW over the trainable partition only (configure_optimizers
    :1184-1197), LambdaLinear warmup multiplier stepped per optimizer step
  * optional EMA (off in v1)

Distribution: the step is shape-polymorphic over the batch; run it under jit
with batch sharded on the ``data`` mesh axis and params replicated — XLA
inserts the gradient all-reduce (the NCCL/DeepSpeed replacement; see
pbe_tpu.parallel.mesh).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pbe_tpu.models.pbe import PaintByExample
from pbe_tpu.training.ema import EmaState, ema_init, ema_update
from pbe_tpu.training.lr_schedule import LambdaLinearScheduler
from pbe_tpu.training.partition import merge_params, split_params


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # trainable partition
    frozen: Any          # frozen partition (VAE + CLIP trunk)
    opt_state: Any
    ema: EmaState | None = None


def default_scheduler() -> LambdaLinearScheduler:
    """configs/v1.yaml:21-28 — 10k-step warmup 1e-6 -> 1, then flat."""
    return LambdaLinearScheduler(
        warm_up_steps=[10000], f_min=[1.0], f_max=[1.0], f_start=[1e-6],
        cycle_lengths=[10_000_000_000_000],
    )


def make_optimizer(
    base_lr: float = 1e-5,
    scheduler: Callable | None = None,
    weight_decay: float = 0.01,
    mu_dtype: Any = None,
) -> optax.GradientTransformation:
    """AdamW (torch-default betas/eps/wd, matching ddpm.py:460-465's fused
    AdamW) with the LR-multiplier schedule folded in.

    mu_dtype=jnp.bfloat16 halves the first-moment memory — useful for
    single-chip training of the ~1B-trainable-param v1 model (the reference
    needed 8 GPUs + ZeRO-3 + CPU offload; one 16GB chip is tight)."""
    mult = scheduler or default_scheduler()
    return optax.adamw(
        learning_rate=lambda step: base_lr * mult(step),
        b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay,
        mu_dtype=mu_dtype,
    )


def create_train_state(
    model: PaintByExample,
    variables: dict,
    tx: optax.GradientTransformation,
    use_ema: bool = False,
    copy: bool = True,
) -> TrainState:
    """copy=True protects the caller's `variables` from donation (the train
    step donates the state and device_put may alias) at the cost of a second
    copy of the ~5GB parameter set. Pass copy=False when the caller discards
    `variables` — required headroom for single-chip full-geometry training."""
    trainable, frozen = split_params(variables["params"])
    if copy:
        trainable = jax.tree.map(jnp.array, trainable)
        frozen = jax.tree.map(jnp.array, frozen)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=trainable,
        frozen=frozen,
        opt_state=tx.init(trainable),
        ema=ema_init(trainable) if use_ema else None,
    )


def normalize_uint8_batch(batch: dict) -> dict:
    """Device-side unpack of the uint8 transfer format (see
    OpenImagesDataset(uint8=True)): image u8 -> [-1,1] float, mask u8
    (255 = keep) -> {0,1} float, inpaint_image = image * mask (never
    transferred), ref u8 -> CLIP-normalized float. Matches the host float
    path bit-exactly (hosts compute u8/255 in float32 too). No-op for
    float batches, so one loss_fn serves both pipelines."""
    img = batch.get("image")
    if img is None or img.dtype != jnp.uint8:
        return batch
    from pbe_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    image = img.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    mask = (batch["mask"] > 127).astype(jnp.float32)
    ref01 = batch["ref"].astype(jnp.float32) / 255.0
    ref = (ref01 - jnp.asarray(CLIP_MEAN, jnp.float32)) / jnp.asarray(
        CLIP_STD, jnp.float32)
    out = {k: v for k, v in batch.items()
           if k not in ("image", "mask", "ref")}
    out.update(image=image, inpaint_image=image * mask, mask=mask, ref=ref)
    return out


def make_loss_fn(model: PaintByExample, det_first_stage: bool = False):
    """det_first_stage=True uses the VAE posterior MODE instead of sampling
    it per step (reference parity is sampling, latent_diffusion.py:255-262).
    Useful when the first stage is random-init (overfit demos, unit tests):
    a random-init posterior's std is ~1.8x its mean's RMS, so the sampled
    target is noise-dominated and memorization metrics floor out."""
    sched = model.schedule
    sqrt_acp = jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32)
    sqrt_1macp = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32)
    lvlb_w = jnp.asarray(sched.lvlb_weights, jnp.float32)

    def loss_fn(trainable, frozen, batch, rng):
        """batch: image/inpaint_image NHWC [-1,1]; mask (B,H,W,1) keep=1;
        ref (B,224,224,3) CLIP-normalized — or the uint8 transfer format
        (normalize_uint8_batch)."""
        batch = normalize_uint8_batch(batch)
        params = {"params": merge_params(trainable, frozen)}
        r_vae, r_t, r_noise, r_uc = jax.random.split(rng, 4)
        b = batch["image"].shape[0]

        z, z_inpaint, m_lat = model.apply(
            params, batch["image"], batch["inpaint_image"], batch["mask"],
            None if det_first_stage else r_vae,
            method=PaintByExample.prepare_latents,
        )
        c = model.apply(params, batch["ref"], method=PaintByExample.get_conditioning)
        uc = model.apply(params, b, method=PaintByExample.uncond_vector)
        u = jax.random.uniform(r_uc, ())
        cond = jnp.where(u < model.u_cond_percent, uc.astype(c.dtype), c)

        t = jax.random.randint(r_t, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(r_noise, z.shape, jnp.float32)
        z32 = z.astype(jnp.float32)
        x_noisy = (
            sqrt_acp[t][:, None, None, None] * z32
            + sqrt_1macp[t][:, None, None, None] * noise
        ).astype(z.dtype)
        x9 = jnp.concatenate([x_noisy, z_inpaint, m_lat], axis=-1)

        eps = model.apply(params, x9, t, cond, method=PaintByExample.apply_model)
        per_ex = jnp.mean(
            (eps.astype(jnp.float32) - noise) ** 2, axis=(1, 2, 3)
        )
        # optional per-example weights (Trainer._put_batch pads ragged
        # batches to the mesh size with zero-weight rows; the weighted mean
        # is then exactly the mean over the real rows — unbiased gradients)
        w = batch.get("weight")
        if w is None:
            w = jnp.ones((b,), jnp.float32)
        wsum = jnp.maximum(w.sum(), 1e-9)
        loss_simple = (w * per_ex).sum() / wsum
        loss_vlb = (w * lvlb_w[t] * per_ex).sum() / wsum
        # v1: logvar == 0 and original_elbo_weight == 0 -> loss == loss_simple
        loss = loss_simple
        metrics = {
            "loss_simple": loss_simple,
            "loss_vlb": loss_vlb,
            "loss": loss,
        }
        return loss, metrics

    return loss_fn


def make_train_step(
    model: PaintByExample,
    tx: optax.GradientTransformation,
    use_ema: bool = False,
    donate: bool = True,
    det_first_stage: bool = False,
):
    loss_fn = make_loss_fn(model, det_first_stage=det_first_stage)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.frozen, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params) if state.ema is not None else None
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model: PaintByExample, det_first_stage: bool = False):
    """Validation loss (no-EMA variant of validation_step,
    latent_diffusion.py:1125-1135). Use state.ema.shadow for the _ema pass."""
    loss_fn = make_loss_fn(model, det_first_stage=det_first_stage)

    def eval_step(params, frozen, batch, rng):
        _, metrics = loss_fn(params, frozen, batch, rng)
        return metrics

    return eval_step
