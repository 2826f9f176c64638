"""JAX -> torch -> JAX round trip through the exporters/converters."""
import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.convert import convert_state_dict
from pbe_tpu.convert.to_torch import export_state_dict
from pbe_tpu.convert.torch_ckpt import validate_against
from tests.test_convert import _tiny_model


def test_export_then_import_is_identity():
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 1)),
        jnp.zeros((1, 16, 16, 3)), rng,
        method=type(model).initialize_all,
    )
    sd = export_state_dict(variables["params"])
    # spot-check reference key spellings
    assert "model.diffusion_model.input_blocks.0.0.weight" in sd
    assert "first_stage_model.encoder.mid.attn_1.q.weight" in sd
    assert "cond_stage_model.mapper.resblocks.0.attn.c_qkv.weight" in sd
    assert "cond_stage_model.transformer.vision_model.embeddings.class_embedding" in sd
    assert "proj_out.weight" in sd and "learnable_vector" in sd
    # torch layouts
    k = sd["model.diffusion_model.input_blocks.0.0.weight"]
    assert k.shape[1] == 9 and k.shape[2:] == (3, 3)

    back, dropped = convert_state_dict(sd)
    assert dropped == []
    missing, unexpected, mismatched = validate_against(
        back["params"], variables["params"]
    )
    assert missing == unexpected == mismatched == []
    for a, b in zip(
        sorted(jax.tree_util.tree_leaves_with_path(back["params"]),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(variables["params"]),
               key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_train_from_scratch_keeps_only_frozen_towers(tmp_path):
    """drop_torch_prefixes=("model.",) reproduces the reference's
    --train_from_scratch (main.py:244-248): diffusion-model keys are
    filtered before conversion so the UNet keeps its random init, while
    first-stage (VAE) / cond-stage (CLIP) weights load from the ckpt."""
    import torch
    from pbe_tpu.pipelines.loading import overlay_checkpoint

    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    init_kw = dict(method=type(model).initialize_all)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 1)),
        jnp.zeros((1, 16, 16, 3)), rng, **init_kw)
    # a "trained" checkpoint: every exported tensor shifted by +1
    sd = {k: torch.from_numpy(np.asarray(v) + 1.0)
          for k, v in export_state_dict(variables["params"]).items()}
    path = tmp_path / "trained.ckpt"
    torch.save({"state_dict": sd}, path)

    out = overlay_checkpoint(variables, str(path), verbose=False,
                             drop_torch_prefixes=("model.",))

    def flat(tree):
        return {"/".join(str(p) for p in k): np.asarray(v) for k, v in
                jax.tree_util.tree_leaves_with_path(tree)}

    before, after = flat(variables["params"]), flat(out["params"])
    n_kept, n_loaded = 0, 0
    for key in before:
        if key.split("/")[0].strip("[]'") == "model":  # UNet subtree
            np.testing.assert_array_equal(after[key], before[key])
            n_kept += 1
        else:  # VAE / CLIP / projection heads come from the ckpt
            np.testing.assert_allclose(after[key], before[key] + 1.0,
                                       rtol=0, atol=1e-6)
            n_loaded += 1
    assert n_kept > 10 and n_loaded > 10
