"""Acoustic-model trainer: jitted micro-batched steps, plateau LR, best-ckpt.

Behavioral parity with `train_mri_acoustic_model.py:209-541` (OTNLikeTrainer):
AdamW(lr 1e-4, wd 1e-4) + grad-clip 1.0, ReduceLROnPlateau(0.5, patience 5,
min_lr 1e-6), micro-batch gradient accumulation, per-band MAE metrics, early
stop (patience 20 or min-LR), best-val-only checkpoint with full resume,
TensorBoard scalars.

TPU design decisions:
* one jitted train step per optimizer step: micro-batches are a leading scan
  axis — `lax.scan` accumulates gradients on device, no Python loop, no
  GradScaler (bf16 on TPU needs none; the reference needs fp16+scaler only on
  pre-Ampere GPUs, `train_mri_acoustic_model.py:236-242`)
* LR is an `inject_hyperparams` input, so plateau reductions don't recompile
* data parallelism: batch arrives sharded over the mesh's `data` axis; XLA
  inserts the gradient all-reduce (no DDP wrapper)
* loss ramp step is a traced input (no recompile as the ramp advances)
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from mri2speech_tpu.losses.masked_mse_mae import (
    BAND_RANGES,
    compute_band_mae,
    masked_mse_mae_loss,
)
from mri2speech_tpu.parallel.mesh import (
    acoustic_param_sharding,
    batch_sharding,
    host_is_primary,
    replicate,
    replicated_sharding,
)
from mri2speech_tpu.train import checkpoint as ckpt_io
from mri2speech_tpu.train.schedule import ReduceLROnPlateau
from mri2speech_tpu.utils.profiling import StepTimer


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    global_step: jnp.ndarray  # scalar int32


@dataclasses.dataclass
class AcousticTrainerConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    micro_batch_size: int = 2
    ramp_steps: int = 120_000
    early_stop_patience: int = 20
    sched_factor: float = 0.5
    sched_patience: int = 5
    sched_min_lr: float = 1e-6
    max_train_steps: Optional[int] = None
    max_val_steps: Optional[int] = None
    seed: int = 0
    # None = auto: sharded orbax checkpoints when the mesh spans >1 process
    # (multi-host); msgpack single-file otherwise
    use_orbax: Optional[bool] = None


def _reshape_micro(
    batch: Dict[str, np.ndarray], micro_bs: int, *, fixed_mbs: bool = False
) -> Dict[str, np.ndarray]:
    """(B, ...) -> (n_micro, mbs, ...) plus a (n_micro, mbs) `row_valid` mask.

    The reference slices uneven batches into a smaller final micro-batch
    (`train_mri_acoustic_model.py:255-261`); `lax.scan` needs static shapes,
    so uneven batches are instead padded with duplicated samples that are
    marked INVALID in `row_valid` — the loss and band diagnostics drop them
    from every term (`masked_mse_mae_loss(row_valid=...)`), reproducing the
    reference's uneven-slice math. (The duplicates still pass through the
    CNN, keeping BatchNorm statistics in-distribution.)

    fixed_mbs: never shrink mbs below micro_bs — mesh trainers need the
    micro batch axis to stay divisible by the mesh data axis, which the
    constructor validated `micro_batch_size` (not `min(micro_bs, B)`) for.
    """
    B = batch["mri"].shape[0]
    mbs = micro_bs if fixed_mbs else min(micro_bs, B)
    out = dict(batch)
    row_valid = np.ones(B, dtype=np.float32)
    if B % mbs != 0:
        pad = mbs - (B % mbs)
        pad_idx = np.arange(pad) % B  # content irrelevant (row_valid masks it)
        out = {k: np.concatenate([v, v[pad_idx]], axis=0) for k, v in out.items()}
        row_valid = np.concatenate([row_valid, np.zeros(pad, dtype=np.float32)])
        B += pad
    out["row_valid"] = row_valid
    return {k: v.reshape(B // mbs, mbs, *v.shape[1:]) for k, v in out.items()}


class AcousticTrainer:
    """Stateful shell around the functional jitted steps."""

    def __init__(
        self,
        model,
        config: AcousticTrainerConfig = AcousticTrainerConfig(),
        log_dir: Optional[str] = None,
        mesh=None,
        preempt=None,
    ) -> None:
        """preempt: an optional `train.preempt.PreemptionGuard`; when its
        flag raises (SIGTERM/SIGINT), the epoch loop stops at the next step
        boundary and `fit` writes a full-resume emergency checkpoint."""
        self.model = model
        self.cfg = config
        self.mesh = mesh
        self.preempt = preempt
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip)
            if config.grad_clip and config.grad_clip > 0
            else optax.identity(),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=config.lr,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=config.weight_decay,
            ),
        )
        self.sched = ReduceLROnPlateau(
            config.lr,
            factor=config.sched_factor,
            patience=config.sched_patience,
            min_lr=config.sched_min_lr,
        )
        self.best_val = float("inf")
        self.patience = 0
        self.hist: Dict[str, list] = {"train": [], "val": []}
        self.start_epoch = 1
        self.writer = None
        if log_dir and host_is_primary():  # rank-0 gating (`train.py:114-126`)
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(os.path.abspath(log_dir))
        if mesh is not None:
            n_data = mesh.shape["data"]
            if config.micro_batch_size % n_data != 0:
                raise ValueError(
                    f"micro_batch_size={config.micro_batch_size} must be divisible "
                    f"by the mesh data axis ({n_data}) for batch sharding"
                )
        self.use_orbax = (
            config.use_orbax
            if config.use_orbax is not None
            else jax.process_count() > 1
        )
        self._train_step = jax.jit(self._train_step_fn, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_fn)
        self._rng = jax.random.PRNGKey(config.seed)
        self.step_timer = StepTimer()

    # -- state -------------------------------------------------------------
    def init_state(self, sample_batch: Dict[str, np.ndarray]) -> TrainState:
        rng, self._rng = jax.random.split(self._rng)
        mri = jnp.asarray(sample_batch["mri"][:1])
        variables = self.model.init(rng, mri, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            global_step=jnp.asarray(0, jnp.int32),
        )
        return self._place_state(state)

    # -- mesh placement ------------------------------------------------------
    def _place_state(self, state: TrainState) -> TrainState:
        """Lay the state out on the mesh: params per `acoustic_param_sharding`
        (TP over `model` when the mesh has one; pure replication = DP
        otherwise), batch_stats/opt_state/step replicated. Single device:
        no-op."""
        if self.mesh is None:
            return state
        rep = replicated_sharding(self.mesh)
        return state.replace(
            params=jax.device_put(
                state.params, acoustic_param_sharding(self.mesh, state.params)
            ),
            batch_stats=jax.device_put(state.batch_stats, rep),
            opt_state=jax.device_put(state.opt_state, rep),
            global_step=jax.device_put(state.global_step, rep),
        )

    def _put_micro(self, micro: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Place (n_micro, mbs, ...) arrays: micro axis unsharded, batch dim
        split over the mesh `data` axis (DP). Single-device: plain transfer."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in micro.items()}
        return {
            k: jax.device_put(np.asarray(v), batch_sharding(self.mesh, np.asarray(v).ndim, 1))
            for k, v in micro.items()
        }

    def _put_eval(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        n_data = self.mesh.shape["data"]
        B = np.asarray(batch["mri"]).shape[0]
        if B % n_data == 0:
            return {
                k: jax.device_put(np.asarray(v), batch_sharding(self.mesh, np.asarray(v).ndim, 0))
                for k, v in batch.items()
            }
        # uneven trailing val batch: replicate (identical metrics, no resharding)
        return replicate({k: np.asarray(v) for k, v in batch.items()}, self.mesh)

    # -- functional steps ---------------------------------------------------
    def _train_step_fn(self, state: TrainState, micro_batches, lr: jnp.ndarray, rng):
        """One optimizer step over scanned micro-batches."""
        n_micro = micro_batches["mri"].shape[0]
        model = self.model
        ramp_steps = self.cfg.ramp_steps

        def micro(carry, xs):
            mb, mb_rng = xs
            grads_acc, bstats, loss_acc, mse_acc, mae_acc, band_acc = carry

            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": bstats},
                    mb["mri"],
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": mb_rng},
                )
                rv = mb.get("row_valid")
                loss, mse, mae = masked_mse_mae_loss(
                    out, mb["mel"], mb["mask"], state.global_step.astype(jnp.float32),
                    ramp_steps=ramp_steps, row_valid=rv,
                )
                bands = compute_band_mae(out, mb["mel"], row_valid=rv)
                return loss / n_micro, (updates["batch_stats"], mse, mae, bands)

            (l, (new_bstats, mse, mae, bands)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            band_acc = {k: band_acc[k] + bands[k] for k in band_acc}
            return (
                (grads_acc, new_bstats, loss_acc + l, mse_acc + mse, mae_acc + mae, band_acc),
                None,
            )

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        M = micro_batches["mel"].shape[-1]
        zero_bands = {
            k: jnp.float32(0.0)
            for k, (s, e) in BAND_RANGES.items()
            if min(e, M) > s
        }
        init = (
            zero_grads,
            state.batch_stats,
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(0.0),
            zero_bands,
        )
        micro_rngs = jax.random.split(rng, n_micro)
        (grads, bstats, loss, mse, mae, bands), _ = jax.lax.scan(
            micro, init, (micro_batches, micro_rngs)
        )

        # plateau LR arrives as an input — override the injected hyperparam
        opt_state = state.opt_state
        opt_state[1].hyperparams["learning_rate"] = lr
        updates, new_opt_state = self.tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "mse": mse / n_micro,
            "mae": mae / n_micro,
            **{f"band_{k}": v / n_micro for k, v in bands.items()},
        }
        new_state = TrainState(
            params=new_params,
            batch_stats=bstats,
            opt_state=new_opt_state,
            global_step=state.global_step + 1,
        )
        return new_state, metrics

    def _eval_step_fn(self, state: TrainState, batch):
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["mri"],
            train=False,
        )
        loss, mse, mae = masked_mse_mae_loss(
            out, batch["mel"], batch["mask"], state.global_step.astype(jnp.float32),
            ramp_steps=self.cfg.ramp_steps,
        )
        bands = compute_band_mae(out, batch["mel"])
        return {"loss": loss, "mse": mse, "mae": mae, **{f"band_{k}": v for k, v in bands.items()}}

    # -- epoch loops ---------------------------------------------------------
    def train_epoch(self, state: TrainState, loader, epoch_idx: int = 1):
        limit = self.cfg.max_train_steps or len(loader)
        totals: Dict[str, float] = {}
        steps = 0
        rng_epoch = jax.random.fold_in(self._rng, epoch_idx)
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            micro = self._put_micro(_reshape_micro(
                batch, self.cfg.micro_batch_size, fixed_mbs=self.mesh is not None
            ))
            rng = jax.random.fold_in(rng_epoch, i)
            with self.step_timer.step():
                state, metrics = self._train_step(
                    state, micro, jnp.float32(self.sched.lr), rng
                )
                # force INSIDE the timed region: jit returns at dispatch, and
                # block_until_ready is unreliable through the axon tunnel —
                # only a host fetch proves the step ran (CLAUDE.md). The
                # metrics are fetched every step anyway, so this adds no sync.
                metrics = {k: float(v) for k, v in metrics.items()}
            steps += 1
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + v
            if self.preempt is not None and self.preempt.should_stop():
                break  # safe point: `state` is a consistent post-step snapshot
        n = max(1, steps)
        return state, {k: v / n for k, v in totals.items()}

    def validate(self, state: TrainState, loader):
        limit = self.cfg.max_val_steps or len(loader)
        totals: Dict[str, float] = {}
        steps = 0
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            metrics = self._eval_step(state, self._put_eval(batch))
            steps += 1
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        if steps == 0:
            return {"loss": float("inf"), "mse": float("inf"), "mae": float("inf")}
        return {k: v / steps for k, v in totals.items()}

    # -- checkpointing -------------------------------------------------------
    def save_best(self, path: str, state: TrainState, epoch: int, train_loss: float, val_metrics: Dict[str, float]) -> None:
        if self.use_orbax:
            # multi-host: EVERY process participates (each writes its shards);
            # orbax coordinates, host 0 writes the JSON metadata sidecar
            ckpt_io.save_train_state_orbax(
                path,
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "global_step": state.global_step,
                },
                {
                    "epoch": int(epoch),
                    "scheduler": self.sched.state_dict(),
                    "val_loss": float(val_metrics["loss"]),
                    "val_mse": float(val_metrics.get("mse", float("nan"))),
                    "train_loss": float(train_loss),
                },
            )
            return
        if not host_is_primary():  # rank-0 gating (`train.py:190`)
            return
        obj = {
            "epoch": np.int64(epoch),
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "global_step": int(state.global_step),
            "scheduler": self.sched.state_dict(),
            "val_loss": float(val_metrics["loss"]),
            "val_mse": float(val_metrics.get("mse", float("nan"))),
            "train_loss": float(train_loss),
        }
        ckpt_io.save_checkpoint(path, obj)

    def save_emergency(self, path: str, state: TrainState, epoch: int) -> None:
        """Full-resume snapshot on preemption (same format as `save_best`,
        restorable by `resume_from_checkpoint` unchanged).

        `epoch - 1` is recorded so resume repeats the interrupted epoch; the
        snapshot carries the CURRENT `best_val` (not this epoch's, which
        never validated) so the resumed run keeps the best-checkpoint bar
        where it was. The reference's best-only scheme has no equivalent —
        an interrupted run there loses everything since the last val
        improvement (`train_mri_acoustic_model.py:508-521`)."""
        self.save_best(
            path, state, epoch - 1, float("nan"),
            {"loss": self.best_val, "mse": float("nan")},
        )

    def resume_from_checkpoint(self, path: str, state: TrainState) -> Tuple[TrainState, int]:
        """Full resume: params/opt/sched/epoch/global step (`:393-462`).

        Orbax directories restore onto the CURRENT state's shardings (the
        current arrays are the template), so a checkpoint written on one mesh
        restores onto a different mesh transparently.
        """
        if ckpt_io.is_orbax_checkpoint(path):
            arrays, meta = ckpt_io.restore_train_state_orbax(
                path,
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "global_step": state.global_step,
                },
            )
            if meta.get("scheduler"):
                self.sched.load_state_dict(meta["scheduler"])
            if np.isfinite(meta.get("val_loss", float("nan"))):
                self.best_val = float(meta["val_loss"])
                self.hist["val"].append(float(meta["val_loss"]))
            if np.isfinite(meta.get("train_loss", float("nan"))):
                self.hist["train"].append(float(meta["train_loss"]))
            self.start_epoch = int(meta.get("epoch", 0)) + 1
            self.patience = 0
            new_state = TrainState(
                params=arrays["params"],
                batch_stats=arrays["batch_stats"],
                opt_state=arrays["opt_state"],
                global_step=arrays["global_step"],
            )
            print(
                f"[RESUME] Orbax resume from epoch {self.start_epoch} "
                f"(global step {int(new_state.global_step)})"
            )
            return new_state, self.start_epoch
        template = {
            "epoch": np.int64(0),
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "global_step": 0,
            "scheduler": self.sched.state_dict(),
            "val_loss": 0.0,
            "val_mse": 0.0,
            "train_loss": 0.0,
        }
        obj = ckpt_io.load_checkpoint(path, template)
        self.sched.load_state_dict(obj["scheduler"])
        if np.isfinite(obj["val_loss"]):
            self.best_val = float(obj["val_loss"])
            self.hist["val"].append(float(obj["val_loss"]))
        if np.isfinite(obj["train_loss"]):
            self.hist["train"].append(float(obj["train_loss"]))
        self.start_epoch = int(obj["epoch"]) + 1
        self.patience = 0
        new_state = TrainState(
            params=obj["params"],
            batch_stats=obj["batch_stats"],
            opt_state=obj["opt_state"],
            global_step=jnp.asarray(int(obj["global_step"]), jnp.int32),
        )
        new_state = self._place_state(new_state)
        print(
            f"[RESUME] Resuming from epoch {self.start_epoch} "
            f"(global step {int(obj['global_step'])}) with best_val={self.best_val:.6f}"
        )
        return new_state, self.start_epoch

    # -- fit -----------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_loader,
        val_loader,
        epochs: int,
        save_path: str = "best_mri_acoustic_model.ckpt",
        emergency_path: Optional[str] = None,
    ) -> TrainState:
        print(
            f"[TRAIN] Start training: start_epoch={self.start_epoch}, "
            f"target_epochs={epochs}, micro_batch={self.cfg.micro_batch_size}"
        )
        if emergency_path is None:
            emergency_path = save_path + ".preempt"
        for ep in range(self.start_epoch, epochs + 1):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(ep)
            t0 = time.time()
            state, tr = self.train_epoch(state, train_loader, epoch_idx=ep)
            if self.preempt is not None and self.preempt.should_stop():
                # grace windows are short: skip validation, snapshot, leave
                self.save_emergency(emergency_path, state, ep)
                print(
                    f"[PREEMPT] Signal received: full-resume snapshot saved "
                    f"to {emergency_path} at global step "
                    f"{int(jax.device_get(state.global_step))} (epoch {ep} "
                    f"will repeat on resume)."
                )
                return state
            va = self.validate(state, val_loader)
            dt = time.time() - t0

            self.hist["train"].append(tr.get("loss", float("nan")))
            self.hist["val"].append(va.get("loss", float("nan")))
            if self.writer:
                self.writer.add_scalar("loss/train", tr.get("loss", 0.0), ep)
                self.writer.add_scalar("loss/val", va.get("loss", 0.0), ep)
                self.writer.add_scalar("metrics/train_mse", tr.get("mse", 0.0), ep)
                self.writer.add_scalar("metrics/val_mse", va.get("mse", 0.0), ep)
                self.writer.add_scalar("metrics/train_mae", tr.get("mae", 0.0), ep)
                self.writer.add_scalar("metrics/val_mae", va.get("mae", 0.0), ep)
                for name in BAND_RANGES:
                    if f"band_{name}" in tr:
                        self.writer.add_scalar(f"band/train_{name}", tr[f"band_{name}"], ep)
                    if f"band_{name}" in va:
                        self.writer.add_scalar(f"band/val_{name}", va[f"band_{name}"], ep)
                self.writer.add_scalar("lr", self.sched.lr, ep)
                self.writer.add_scalar("perf/epoch_seconds", dt, ep)
                for name, value in self.step_timer.summary().items():
                    self.writer.add_scalar(f"perf/{name}", value, ep)
                self.writer.flush()

            print(f"\nEpoch {ep}/{epochs}  ({dt:.1f}s)")
            print(f"Train: loss={tr.get('loss', float('nan')):.6f} mse={tr.get('mse', float('nan')):.6f} mae={tr.get('mae', float('nan')):.6f}")
            print(f"Val  : loss={va['loss']:.6f} mse={va.get('mse', float('nan')):.6f} mae={va.get('mae', float('nan')):.6f}")
            print(f"LR: {self.sched.lr:.2e}")

            old_lr = self.sched.lr
            new_lr = self.sched.step(va["loss"])
            if new_lr != old_lr:
                print(f"[SCHEDULER] LR reduced: {old_lr:.6e} -> {new_lr:.6e}")

            if va["loss"] < self.best_val and np.isfinite(va["loss"]):
                self.best_val = va["loss"]
                self.patience = 0
                self.save_best(save_path, state, ep, tr.get("loss", float("nan")), va)
                print("[BEST] New best model saved.")
            else:
                self.patience += 1

            if self.patience >= self.cfg.early_stop_patience:
                print("[STOP] Early stopping.")
                break
            if self.sched.lr <= self.cfg.sched_min_lr + 1e-12:
                print("[STOP] LR reached min.")
                break
        # completed without preemption: a leftover emergency snapshot (this
        # run resumed from one, or an older run left one) is now stale —
        # regardless of whether THIS run had a guard (a guardless run that
        # auto-resumed the snapshot must not leave it to be re-resumed)
        if host_is_primary():
            import shutil

            if os.path.isdir(emergency_path):
                shutil.rmtree(emergency_path, ignore_errors=True)
            elif os.path.exists(emergency_path):
                os.remove(emergency_path)
        return state
