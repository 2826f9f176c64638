"""First-stage (VAE) training.

The reference carries the KL-VAE's Lightning training steps + an
LPIPS+PatchGAN loss stack (autoencoder.py:88-134, losses/contperceptual.py)
but never exercises them for PBE (lossconfig is torch.nn.Identity,
configs/v1.yaml:68-69). This module rebuilds the *capability*:

  * reconstruction (L1 or L2) + KL with the reference's weighting shape
  * optional PatchGAN discriminator with hinge loss and the ADAPTIVE
    generator weight (losses/contperceptual.py:32-43):
        d_weight = ||∇_last rec_loss|| / (||∇_last gan_loss|| + 1e-4),
    clipped to [0, 1e4], detached, scaled by disc_weight — where `last` is
    the decoder's final conv kernel. Computed here as two VJPs of a single
    shared decode forward (cheaper than the reference's two full
    autograd.grad passes).
  * perceptual term is pluggable: use
    pbe_tpu.training.perceptual.make_vgg_perceptual_fn with converted
    torchvision VGG16 weights (LPIPS needs pretrained weights, which this
    zero-egress environment cannot fetch at build time)

Loss scaling note: the reference computes nll/kl as sum/batch; we use means
(sum/batch/numel). The adaptive d_weight is proportional to the rec-loss
gradient, so every term scales by the same 1/numel factor and the total loss
is exactly the reference's divided by numel — same optimum, same relative
weighting, absorbed by the learning rate.

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
from flax import traverse_util

from pbe_tpu.models.vae import (
    AutoencoderKL,
    diagonal_gaussian_kl,
    sample_diagonal_gaussian,
)

# the reference's `last_layer`: decoder.conv_out.weight (autoencoder.py
# passes self.decoder.conv_out.weight as last_layer)
_LAST_LAYER = ("params", "decoder", "conv_out", "kernel")


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


def calculate_adaptive_weight(
    vae: AutoencoderKL,
    disc: PatchDiscriminator,
    vae_params,
    disc_params,
    images: jnp.ndarray,
    rng: jax.Array,
    rec_fn: Callable,
    disc_weight: float = 0.5,
) -> jnp.ndarray:
    """d_weight = ||∇_last rec|| / (||∇_last gan|| + 1e-4), clip [0,1e4],
    x disc_weight (contperceptual.py:32-43). `last` = decoder conv_out
    kernel. Both gradients are VJPs of one shared decode forward."""
    mean, logvar = vae.apply(vae_params, images, method=AutoencoderKL.encode)
    z = sample_diagonal_gaussian(rng, mean, logvar)

    flat = traverse_util.flatten_dict(vae_params)
    last = flat[_LAST_LAYER]

    def decode_of(kernel):
        f2 = dict(flat)
        f2[_LAST_LAYER] = kernel
        return vae.apply(
            traverse_util.unflatten_dict(f2), z, method=AutoencoderKL.decode
        )

    recon, decode_vjp = jax.vjp(decode_of, last)
    d_rec = jax.grad(lambda r: jnp.mean(rec_fn(images, r)))(recon)
    d_gan = jax.grad(lambda r: -jnp.mean(disc.apply(disc_params, r)))(recon)
    (rec_g,) = decode_vjp(d_rec)
    (gan_g,) = decode_vjp(d_gan)
    d_weight = jnp.linalg.norm(rec_g.ravel()) / (
        jnp.linalg.norm(gan_g.ravel()) + 1e-4
    )
    return jnp.clip(d_weight, 0.0, 1e4) * disc_weight


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
    adaptive_d_weight: bool = True,
):
    """Returns train_step(state, images, rng) alternating G/D like the
    reference's optimizer_idx scheme (losses/contperceptual.py semantics).

    adaptive_d_weight=True (the reference default) rebalances the generator's
    GAN term against the reconstruction term per step via the last-decoder-
    layer gradient-norm ratio; False uses the fixed disc_weight."""

    def rec(x, y):
        if rec_loss == "l1":
            e = jnp.abs(x - y)
        else:
            e = (x - y) ** 2
        if perceptual_fn is not None:
            e = e + perceptual_weight * perceptual_fn(x, y)
        return e

    def g_loss_fn(vae_params, disc_params, images, rng, use_gan, d_weight):
        (recon, (mean, logvar)) = vae.apply(vae_params, images, rng, sample=True)
        rec_l = jnp.mean(rec(images, recon))
        kl_l = jnp.mean(diagonal_gaussian_kl(mean, logvar)) / images[0].size
        g_gan = -jnp.mean(disc.apply(disc_params, recon)) * use_gan
        loss = rec_l + kl_weight * kl_l + d_weight * g_gan
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
        if adaptive_d_weight:
            # detached in the reference (contperceptual.py:41 .detach()) —
            # computed outside the differentiated loss for the same effect
            d_weight = calculate_adaptive_weight(
                vae, disc, state.vae_params, state.disc_params, images, rng,
                rec, disc_weight,
            )
        else:
            d_weight = jnp.asarray(disc_weight, jnp.float32)
        (g_l, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.vae_params, state.disc_params, images, rng, use_gan, d_weight
        )
        g_upd, vae_opt = tx.update(g_grads, state.vae_opt, state.vae_params)
        vae_params = optax.apply_updates(state.vae_params, g_upd)

        (d_l, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.disc_params, vae_params, images, rng
        )
        d_upd, disc_opt = tx.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_upd)

        metrics = {"g_loss": g_l, "rec": aux["rec"], "kl": aux["kl"],
                   "d_loss": d_l, "d_weight": d_weight}
        return (
            state.replace(step=state.step + 1, vae_params=vae_params,
                          disc_params=disc_params, vae_opt=vae_opt,
                          disc_opt=disc_opt),
            metrics,
        )

    return train_step
