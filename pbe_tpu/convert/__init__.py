from pbe_tpu.convert.torch_ckpt import (
    convert_state_dict,
    load_torch_checkpoint,
    convert_clip_vision_state_dict,
    convert_safety_checker_state_dict,
)

__all__ = [
    "convert_state_dict",
    "load_torch_checkpoint",
    "convert_clip_vision_state_dict",
    "convert_safety_checker_state_dict",
]
