from pbe_tpu.samplers.cfg import make_cfg_eps_fn
from pbe_tpu.samplers.ddim import ddim_sample
from pbe_tpu.samplers.ddpm_ancestral import ddpm_ancestral_sample
from pbe_tpu.samplers.plms import plms_sample

__all__ = [
    "make_cfg_eps_fn", "ddim_sample", "plms_sample", "ddpm_ancestral_sample",
]
