"""Worker + shared harness for the multi-process distributed test.

Run as a subprocess (one per rank) it joins a 2-process x 4-virtual-CPU-
device JAX distributed runtime (gloo cross-process collectives), trains a
tiny Paint-by-Example model for a few steps with each process feeding only
its host-local half of the global batch, and rank 0 writes the loss
trajectory to a JSON file. The test then replays the identical global
computation on a single-process 8-device mesh and asserts trajectory
equality — the hardware-free analogue of the reference's per-rank NCCL
training (main.py:224,311-327).

The tiny geometry is intentionally minimal: this file tests *cross-process
semantics* (distributed init, make_array_from_process_local_data, gloo
all-reduce); full-wiring coverage lives in __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

N_STEPS = 3
GLOBAL_BATCH = 8
H = 16  # image size -> 8^2 latents through the 1-downsample VAE


def _tiny_model(dtype):
    from pbe_tpu.models.clip_vit import CLIPVisionConfig
    from pbe_tpu.models.exemplar import ExemplarEncoderConfig
    from pbe_tpu.models.pbe import PaintByExample
    from pbe_tpu.models.unet import UNetConfig
    from pbe_tpu.models.vae import AutoencoderKLConfig

    return PaintByExample(
        unet_config=UNetConfig(
            model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1,), num_heads=2, context_dim=768,
            use_checkpoint=False,
        ),
        vae_config=AutoencoderKLConfig(
            ddconfig={"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
                      "z_channels": 4, "double_z": True, "out_ch": 3,
                      "in_channels": 3, "resolution": H},
            embed_dim=4,
        ),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(hidden_size=64, num_layers=1, num_heads=2,
                                  mlp_dim=64, patch_size=8, image_size=16),
            mapper_layers=1,
        ),
        dtype=dtype,
    )


def _global_batch(dtype):
    import jax.numpy as jnp
    import numpy as np

    g = np.random.default_rng(0)
    image = jnp.asarray(g.uniform(-1, 1, (GLOBAL_BATCH, H, H, 3)), dtype)
    mask = jnp.ones((GLOBAL_BATCH, H, H, 1), dtype)
    mask = mask.at[:, H // 4: 3 * H // 4, H // 4: 3 * H // 4, :].set(0.0)
    return {
        "image": image,
        "inpaint_image": image * mask,
        "mask": mask,
        "ref": jnp.asarray(g.standard_normal((GLOBAL_BATCH, 16, 16, 3)),
                           dtype),
    }


def run_steps() -> list[float]:
    """Train N_STEPS on the global 8-device mesh; works identically in
    single-process (8 local devices) and multi-process (2 x 4) modes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.parallel import (
        batch_sharding, host_local_to_global, make_mesh, replicated,
        zero_shard_opt_state,
    )
    from pbe_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    assert jax.device_count() == 8, jax.devices()
    mesh = make_mesh()
    dtype = jnp.float32
    model = _tiny_model(dtype)
    tx = make_optimizer(base_lr=1e-4)

    repl = replicated(mesh)

    def init_state(rng):
        from pbe_tpu.models.pbe import PaintByExample

        variables = model.init(
            {"params": rng},
            jnp.zeros((1, H, H, 3), dtype), jnp.ones((1, H, H, 1), dtype),
            jnp.zeros((1, 16, 16, 3), dtype), rng,
            method=PaintByExample.initialize_all,
        )
        return create_train_state(model, variables, tx)

    # shardings must be known to jit the init with out_shardings; build them
    # from an abstract evaluation (cheap, no FLOPs)
    shapes = jax.eval_shape(init_state, jax.random.PRNGKey(0))
    state_sh = shapes.replace(
        step=repl,
        params=jax.tree.map(lambda _: repl, shapes.params),
        frozen=jax.tree.map(lambda _: repl, shapes.frozen),
        opt_state=zero_shard_opt_state(shapes.opt_state, mesh, min_size=1024),
        ema=None,
    )
    # jit-with-out_shardings is THE multihost init pattern: the same SPMD
    # program runs on every process and each materializes only its shards —
    # no host ever needs a full copy and no cross-host device_put exists.
    state = jax.jit(init_state, out_shardings=state_sh)(jax.random.PRNGKey(0))

    batch = _global_batch(dtype)
    if jax.process_count() > 1:
        per_proc = GLOBAL_BATCH // jax.process_count()
        lo = jax.process_index() * per_proc
        local = jax.tree.map(
            lambda x: np.asarray(x[lo: lo + per_proc]), batch
        )
        batch_d = host_local_to_global(local, mesh)
    else:
        bsh = batch_sharding(mesh)
        batch_d = jax.device_put(batch, jax.tree.map(lambda _: bsh, batch))

    step = jax.jit(
        make_train_step(model, tx),
        in_shardings=(state_sh, jax.tree.map(lambda _: batch_sharding(mesh),
                                             batch), repl),
        out_shardings=(state_sh, repl),
    )
    losses = []
    for i in range(N_STEPS):
        state, metrics = step(state, batch_d, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(x) for x in losses), losses
    return losses


def main() -> None:
    rank, nproc, port, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    os.environ["PBE_COORDINATOR"] = f"localhost:{port}"
    os.environ["PBE_NUM_PROCESSES"] = str(nproc)
    os.environ["PBE_PROCESS_ID"] = str(rank)
    os.environ.setdefault("PBE_DIST_BACKEND", "gloo")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from pbe_tpu.parallel import maybe_initialize

    assert maybe_initialize(), "distributed init did not happen"
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    losses = run_steps()
    if rank == 0:
        with open(outfile, "w") as f:
            json.dump(losses, f)
    print(f"rank {rank}: OK {losses}", flush=True)


if __name__ == "__main__":
    main()
