"""pbe_tpu — TPU-native Paint-by-Example framework.

A from-scratch JAX/XLA/Pallas rebuild of exemplar-guided image editing with
latent diffusion (capability reference: zhanwenchen/pbe; see SURVEY.md).

Layout:
    pbe_tpu.config     YAML + registry dependency injection (configs/v1.yaml surface)
    pbe_tpu.schedules  diffusion beta/DDIM schedule math (static, numpy)
    pbe_tpu.ops        attention (XLA + Pallas flash), norms, image ops
    pbe_tpu.models     VAE, UNet, CLIP ViT, exemplar encoder, PaintByExample
    pbe_tpu.samplers   DDIM / PLMS as lax.scan loops with folded CFG
    pbe_tpu.parallel   device mesh + sharding rules
    pbe_tpu.training   pjit train step, LR schedule, EMA, trainer loop
    pbe_tpu.data       datasets, mask generation, augmentation
    pbe_tpu.evaltools  FID / CLIP score / QS(GMM) evaluation
    pbe_tpu.convert    torch checkpoint -> JAX pytree converter
    pbe_tpu.pipelines  end-to-end jitted edit pipelines
    pbe_tpu.serving    micro-batching online edit server
"""

__version__ = "0.1.0"


def load_pipeline(*args, **kwargs):
    """Convenience re-export: pbe_tpu.pipelines.loading.load_pipeline."""
    from pbe_tpu.pipelines.loading import load_pipeline as _lp

    return _lp(*args, **kwargs)


def build_from_yaml(*args, **kwargs):
    """Convenience re-export: pbe_tpu.models.pbe.build_from_yaml."""
    from pbe_tpu.models.pbe import build_from_yaml as _b

    return _b(*args, **kwargs)
