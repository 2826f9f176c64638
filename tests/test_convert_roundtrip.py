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
