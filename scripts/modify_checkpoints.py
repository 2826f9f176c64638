"""9-channel checkpoint surgery (reference: scripts/modify_checkpoints.py).

Widens a plain Stable-Diffusion v1 torch checkpoint's first UNet conv from 4
to 9 input channels by concatenating zeros, writing a new torch .ckpt that
both the reference and pbe_tpu can load.

    python scripts/modify_checkpoints.py sd-v1-4.ckpt sd-v1-4-modified-9channel.ckpt

(Note: pbe_tpu's own loader applies this surgery automatically when handed a
4-channel checkpoint — this script exists for file-level parity.)
"""
import sys


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    key = "model.diffusion_model.input_blocks.0.0.weight"
    w = sd[key]
    if w.shape[1] >= 9:
        print(f"{key} already has {w.shape[1]} input channels; copying as-is")
    else:
        zeros = torch.zeros(w.shape[0], 9 - w.shape[1], *w.shape[2:], dtype=w.dtype)
        sd[key] = torch.cat((w, zeros), dim=1)
        print(f"widened {key}: {tuple(w.shape)} -> {tuple(sd[key].shape)}")
    torch.save(ckpt if "state_dict" in ckpt else sd, dst)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
