"""Training driver: loop + validation + Orbax checkpointing + metrics.

Replaces the reference's Lightning Trainer assembly (main.py:98-377):
  * data-parallel mesh (pbe_tpu.parallel) instead of DeepSpeed/NCCL
  * Orbax async checkpoints, top-k selected on ``val/loss_simple`` (the
    reference monitored val/loss_simple_ema with top-5, main.py:287)
  * resume actually works (the reference hard-disabled it, main.py:197)
  * metrics stream to stdout + a JSONL file (wandb equivalent without egress)
"""
from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from pbe_tpu.models.pbe import PaintByExample
from pbe_tpu.parallel import (
    batch_sharding,
    host_local_to_global,
    is_main_process,
    make_mesh,
    replicated,
    zero_shard_opt_state,
)
from pbe_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


class MetricLogger:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: dict[str, Any], prefix: str = "train") -> None:
        row = {"step": int(step), **{
            f"{prefix}/{k}": float(v) for k, v in metrics.items()
        }, "time": time.time()}
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class Trainer:
    def __init__(
        self,
        model: PaintByExample,
        variables: dict,
        base_lr: float = 1e-5,
        logdir: str = "logs/run",
        use_ema: bool = False,
        zero_shard: bool = True,
        max_to_keep: int = 5,
        seed: int = 0,
        num_devices: int | None = None,
        mu_dtype=None,
        consume_variables: bool = False,
        scheduler=None,
        det_first_stage: bool = False,
    ):
        self.model = model
        self.logdir = logdir
        self.tx = make_optimizer(base_lr=base_lr, mu_dtype=mu_dtype,
                                 scheduler=scheduler)
        self.state = create_train_state(
            model, variables, self.tx, use_ema=use_ema,
            copy=not consume_variables,
        )
        devices = jax.devices()[:num_devices] if num_devices else None
        self.mesh = make_mesh(devices)
        # multi-process (multi-host) mode: every process runs this same
        # trainer over the GLOBAL mesh; batches are per-process host-local
        # shards promoted via make_array_from_process_local_data, and only
        # rank 0 writes logs (Orbax checkpointing is inherently multihost —
        # every process participates in save/restore).
        self._multiprocess = jax.process_count() > 1
        self.rng = jax.random.PRNGKey(seed)
        self.logger = MetricLogger(logdir) if is_main_process() else None

        repl = replicated(self.mesh)
        self._repl = repl
        opt_sh = (
            zero_shard_opt_state(self.state.opt_state, self.mesh)
            if zero_shard else jax.tree.map(lambda _: repl, self.state.opt_state)
        )
        self.state_sharding = self.state.replace(
            step=repl,
            params=jax.tree.map(lambda _: repl, self.state.params),
            frozen=jax.tree.map(lambda _: repl, self.state.frozen),
            opt_state=opt_sh,
            ema=(jax.tree.map(lambda _: repl, self.state.ema)
                 if self.state.ema is not None else None),
        )
        self.state = jax.device_put(self.state, self.state_sharding)
        self._batch_sharding = batch_sharding(self.mesh)

        self.train_step = jax.jit(
            make_train_step(model, self.tx, det_first_stage=det_first_stage),
            donate_argnums=0,
        )
        self.eval_step = jax.jit(
            make_eval_step(model, det_first_stage=det_first_stage))

        self._sample_pipeline = None
        ckpt_dir = Path(logdir).absolute() / "checkpoints"
        # top-k selection on the reference's monitor (configs/v1.yaml:16,
        # main.py:287): val/loss_simple_ema when EMA runs, else the raw loss
        monitor = "val/loss_simple_ema" if use_ema else "val/loss_simple"
        self.ckpt_mgr = ocp.CheckpointManager(
            ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get(monitor, float("inf")),
                best_mode="min",
            ),
        )

    # -- checkpointing -----------------------------------------------------
    def save(self, metrics: dict | None = None) -> None:
        self.ckpt_mgr.save(
            int(self.state.step),
            args=ocp.args.StandardSave(self.state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, step: int | None = None) -> bool:
        step = step if step is not None else self.ckpt_mgr.latest_step()
        if step is None:
            return False
        self.state = self.ckpt_mgr.restore(
            step, args=ocp.args.StandardRestore(self.state)
        )
        return True

    def _put_batch(self, batch: dict) -> dict:
        if self._multiprocess:
            # each process contributes its host-local slice of the global
            # batch; the data never crosses hosts
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            arrays = self._pad_ragged(arrays, jax.local_device_count())
            return host_local_to_global(arrays, self.mesh)
        # already-device-resident entries (e.g. a fixed batch the caller
        # transferred once) pass through: device_put with the same sharding
        # is a no-op, so repeated epochs over cached device batches cost
        # zero H2D (the tunnel transfer is ~60 MB/step at 512^2 batch 8)
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, (np.ndarray, jax.Array))}
        arrays = self._pad_ragged(arrays, self.mesh.size)
        return jax.device_put(
            arrays, jax.tree.map(lambda _: self._batch_sharding, arrays)
        )

    @staticmethod
    def _pad_ragged(arrays: dict, n: int) -> dict:
        """Batch sharding needs batch % n_devices == 0. Ragged batches (e.g.
        a final partial batch, or any val batch smaller than the mesh — the
        round-4 crash) are padded by repeating the last row, with a ``weight``
        vector zeroing the padded rows so the weighted loss in
        train_step.make_loss_fn is exactly the mean over the real rows.
        Same pad-and-trim idea as EditPipeline.shard (pipelines/inference.py),
        but with exact loss semantics instead of output trimming."""
        if not arrays:
            return arrays
        b = next(iter(arrays.values())).shape[0]
        pad = (-b) % n
        if not pad and "weight" in arrays:
            return arrays

        def _pad_rows(v):
            xp = np if isinstance(v, np.ndarray) else jnp
            return xp.concatenate([v, xp.repeat(v[-1:], pad, axis=0)], axis=0)

        w = arrays.get("weight")
        if w is None:
            w = np.ones((b,), np.float32)
        if pad:
            arrays = {k: _pad_rows(v) for k, v in arrays.items()
                      if k != "weight"}
            w = np.concatenate([np.asarray(w), np.zeros((pad,), np.float32)])
        arrays["weight"] = np.asarray(w, np.float32)
        return arrays

    def _device_batches(self, loader: Iterable) -> Iterator[dict]:
        """One-batch-ahead device_put: batch i+1's host->device transfer is
        dispatched before batch i's step is consumed, so H2D rides under the
        (async-dispatched) running step instead of serializing with it."""
        pending = None
        for batch in loader:
            d = self._put_batch(batch)
            if pending is not None:
                yield pending
            pending = d
        if pending is not None:
            yield pending

    # -- loops ---------------------------------------------------------------
    def fit(
        self,
        train_loader: Iterable,
        val_loader: Iterable | None = None,
        max_steps: int = 1000,
        max_epochs: int | None = None,
        log_every: int = 50,
        val_every: int = 1000,
        ckpt_every: int = 1000,
        sample_images: bool = False,
        fid_feature_fn=None,
        fid_batches: int = 2,
        fid_every: int | None = None,
        sample_steps: int = 50,
        sample_sampler: str = "ddim",
    ) -> None:
        """Train loop. With ``sample_images=True`` every validation also
        samples 6-panel image grids via :meth:`log_images` (the reference's
        validation-time log_images, latent_diffusion.py:1020-1123 via
        main.py:287-295); passing ``fid_feature_fn`` (e.g. a jitted
        InceptionV3 pool3 extractor, see pbe_tpu.evaltools.inception)
        additionally streams ``val/fid_{global,local,ref}`` over
        ``fid_batches`` validation batches into the JSONL metrics
        (callback_fid.py:146-189)."""
        # preemption handling (SURVEY §5 gap: the reference had none): on
        # SIGTERM/SIGINT finish the current step, checkpoint, exit cleanly;
        # a later --resume restores from that checkpoint.
        import signal

        preempted = {"flag": False}

        def _handler(signum, frame):
            preempted["flag"] = True
            print(f"signal {signum}: checkpointing and stopping...", flush=True)

        old_handlers = {
            s: signal.signal(s, _handler) for s in (signal.SIGTERM, signal.SIGINT)
        }

        step = int(self.state.step)
        epoch = 0
        t0 = time.time()
        while step < max_steps and (max_epochs is None or epoch < max_epochs):
            if preempted["flag"]:
                break
            for dbatch in self._device_batches(train_loader):
                if preempted["flag"]:
                    break
                self.state, metrics = self.train_step(
                    self.state, dbatch, self.rng
                )
                # host-side mirror of state.step: reading the device counter
                # here would sync every iteration and stall async dispatch
                step += 1
                if step % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["steps_per_sec"] = log_every / max(time.time() - t0, 1e-9)
                    t0 = time.time()
                    if self.logger:
                        self.logger.log(step, m)
                        print(f"step {step}: " + " ".join(
                            f"{k}={v:.4f}" for k, v in m.items()), flush=True)
                if val_loader is not None and step % val_every == 0:
                    val_m = self.validate(val_loader)
                    # fid_every thins the (expensive) FID trio to every N
                    # steps while image grids keep the validation cadence;
                    # None = FID at every validation (back-compat)
                    want_fid = fid_feature_fn is not None and (
                        fid_every is None or step % fid_every == 0)
                    if sample_images or want_fid:
                        val_m.update(self.sample_and_score(
                            val_loader,
                            fid_feature_fn=fid_feature_fn if want_fid else None,
                            fid_batches=fid_batches,
                            steps=sample_steps,
                            sampler=sample_sampler,
                        ))
                    if self.logger:
                        self.logger.log(step, val_m, prefix="val")
                    self.save({f"val/{k}": v for k, v in val_m.items()})
                    t0 = time.time()  # keep steps_per_sec train-only
                elif step % ckpt_every == 0:
                    self.save()
                    t0 = time.time()
                if step >= max_steps:
                    break
            epoch += 1
        if preempted["flag"]:
            self.save()
        for s, h in old_handlers.items():
            signal.signal(s, h)
        self.ckpt_mgr.wait_until_finished()

    def log_images(
        self, batch: dict, outdir: str | None = None, steps: int = 50,
        scale: float = 5.0, sampler: str = "ddim", seed: int = 0,
    ):
        """Sample edits with the current weights and save 6-panel grids —
        the reference's validation-time log_images
        (latent_diffusion.py:1020-1123, sample at CFG scale 5)."""
        from pbe_tpu.pipelines.batch import infer_batch, visualize_batch
        from pbe_tpu.pipelines.inference import EditPipeline
        from pbe_tpu.training.partition import merge_params

        merged = {"params": merge_params(self.state.params, self.state.frozen)}
        if self._sample_pipeline is None:
            self._sample_pipeline = EditPipeline(self.model, merged)
        else:
            self._sample_pipeline.variables = merged
        from pbe_tpu.data.transforms import unpack_uint8_batch

        batch = unpack_uint8_batch(batch)
        arrays = {k: np.asarray(v) for k, v in batch.items()
                  if isinstance(v, (np.ndarray, jnp.ndarray))}
        preds = infer_batch(
            self._sample_pipeline, arrays, steps=steps, scale=scale,
            sampler=sampler, seed=seed,
        )
        out = outdir or os.path.join(
            self.logdir, "samples", f"step_{int(self.state.step):08d}"
        )
        visualize_batch(arrays, preds, out, ids=batch.get("id"))
        return preds

    def sample_and_score(
        self,
        val_loader: Iterable,
        fid_feature_fn=None,
        fid_batches: int = 2,
        steps: int = 50,
        scale: float = 5.0,
        sampler: str = "ddim",
    ) -> dict:
        """Sample edits on validation batches (saving 6-panel grids under
        logdir/samples/step_*) and, given a feature fn, compute the
        in-training FID trio. Returns {} or {'fid_global': ..., ...}."""
        from pbe_tpu.evaltools.fid_callback import FIDTrioTracker

        tracker = (
            FIDTrioTracker(fid_feature_fn) if fid_feature_fn is not None else None
        )
        for i, batch in enumerate(val_loader):
            if i >= fid_batches:
                break
            preds = self.log_images(
                batch, steps=steps, scale=scale, sampler=sampler, seed=i,
            )
            if tracker is not None:
                from pbe_tpu.data.transforms import unpack_uint8_batch

                fb = unpack_uint8_batch(batch)
                arrays = {k: np.asarray(v) for k, v in fb.items()
                          if isinstance(v, (np.ndarray, jnp.ndarray))}
                tracker.update(arrays, preds)
        return tracker.compute() if tracker is not None else {}

    def validate(self, val_loader: Iterable, max_batches: int = 50) -> dict:
        agg: dict[str, list[float]] = {}
        rng = jax.random.PRNGKey(0)
        for i, batch in enumerate(val_loader):
            if i >= max_batches:
                break
            rng = jax.random.fold_in(rng, i)
            dbatch = self._put_batch(batch)
            m = self.eval_step(
                self.state.params, self.state.frozen, dbatch, rng
            )
            for k, v in m.items():
                agg.setdefault(k, []).append(float(v))
            if self.state.ema is not None:
                m_ema = self.eval_step(
                    self.state.ema.shadow, self.state.frozen, dbatch, rng,
                )
                for k, v in m_ema.items():
                    agg.setdefault(f"{k}_ema", []).append(float(v))
        return {k: float(np.mean(v)) for k, v in agg.items()}
