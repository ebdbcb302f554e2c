"""HiFi-GAN vocoder trainer: one jitted D+G step, device-side mels.

Behavioral parity with `train.py:24-262`:
* D-step (MPD+MSD LSGAN on detached fake) then G-step (45x L1 mel +
  feature-matching + adversarial) — with the G-step seeing the *updated*
  discriminators, matching the reference's in-place `optim_d.step()` ordering
* AdaBelief (betas 0.8/0.99, eps 1e-16) for both optimizers (`train.py:64-71`)
* ReduceLROnPlateau(0.1, patience 4) stepped per epoch on the last validation
  mel error (`train.py:78-79,258-259`) — single scheduler, so the reference's
  DDP rank-divergence bug is structurally impossible
* `g_XXXXXXXX` / `do_XXXXXXXX` checkpoint scheme with directory-scan resume
* fine-tuning GT/predicted mel mixing via the dataset's weighted dirs

TPU design:
* mels (generator input in scratch mode + both loss mels) are computed INSIDE
  the jitted step via `ops.mel_spectrogram` — fused with the model graph on the
  MXU instead of per-sample CPU workers (`meldataset.py:192-224`)
* the generator forward runs ONCE per step through `jax.vjp`; the D-step uses
  its stop-gradient, the G-step pulls gradients back through the saved vjp
* spectral-norm power iteration advances once per step (D-step); torch advances
  it on every forward (4x/step) — a documented, immaterial deviation
* data parallelism: batch sharded over the mesh `data` axis; XLA all-reduces
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from mri2speech_tpu.losses.gan import discriminator_loss, feature_loss, generator_loss
from mri2speech_tpu.models.vocoder import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from mri2speech_tpu.ops.mel import mel_spectrogram
from mri2speech_tpu.parallel.mesh import (
    batch_sharding,
    host_is_primary,
    replicate,
)
from mri2speech_tpu.train import checkpoint as ckpt_io
from mri2speech_tpu.train.schedule import ReduceLROnPlateau


class GanState(struct.PyTreeNode):
    gen_params: Any
    mpd_params: Any
    msd_params: Any
    msd_norm_stats: Any
    opt_g: Any
    opt_d: Any


def _quantize_grad_bf16(g: jnp.ndarray) -> jnp.ndarray:
    """Round-trip a gradient through bf16 (kept fp32 at the API boundary).

    The down-cast is the HBM lever (the materialised grad tensor is half as
    wide); the immediate up-cast keeps the optimizer contract — fp32 master
    params, fp32 AdaBelief moments, fp32 update math — and a stable opt-state
    dtype across steps (a bare down-cast would flip the moment trees to bf16
    on the first update and retrace every step after)."""
    return g.astype(jnp.bfloat16).astype(jnp.float32)


def _adabelief(lr: float, state_dtype=None) -> optax.GradientTransformation:
    """Reference AdaBelief hyperparameters (`train.py:64-71`).

    `state_dtype=jnp.bfloat16` stores the two moment trees in bf16 (fp32
    master params and fp32 update math — see train/optim.py); None is
    bit-identical to `optax.adabelief`.
    """
    from mri2speech_tpu.train import optim

    return optax.inject_hyperparams(optim.adabelief, static_args=("state_dtype",))(
        learning_rate=lr, b1=0.8, b2=0.99, eps=1e-16, eps_root=1e-16,
        state_dtype=state_dtype,
    )


@dataclasses.dataclass
class VocoderTrainerConfig:
    fine_tuning: bool = False
    seed: int = 1234
    bf16: bool = False  # bfloat16 compute for G/D forwards (fp32 params/losses)
    # quantize D/G gradients through bf16 (cast down, then straight back up)
    # before the optimizer update: the grad trees are among the largest
    # materialised tensors of the step, so storing them at half width is a
    # candidate HBM lever — while params, AdaBelief moments and all update
    # math stay genuinely fp32 (a plain down-cast would silently turn the
    # moment accumulators bf16 on the first step). See docs/BENCH_NOTES.md
    # for whether it pays on this chip.
    bf16_grads: bool = False
    # bf16 AdaBelief moment storage (fp32 master params; halves optimizer-state
    # HBM traffic on a step measured at 95.8% HBM — docs/BENCH_NOTES.md)
    bf16_opt_state: bool = False
    # run each sub-discriminator ONCE on concat([y, y_hat]) (batch 2B) instead
    # of twice at batch B — exact per sample for every weight-norm sub-D
    # (parity-tested); the MSD's spectral-norm sub-D advances its power
    # iteration once per apply instead of twice (the documented immaterial
    # deviation class, docs/parity_notes.md). MEASURED NEGATIVE as a step
    # default: isolated MSD fwd improves 18.3 -> 14.3 ms, but the FULL D+G
    # step regresses 117.7 -> 125.9 ms (the per-half feature-map slices feeding
    # feature_loss materialize as copies in-graph) — kept as a tested opt-in.
    concat_discriminators: bool = False
    # None = auto: sharded orbax checkpoints when the mesh spans >1 process
    use_orbax: Optional[bool] = None
    # discriminator ensemble size (reference: 5 MPD periods, 3 MSD scales,
    # `models.py:179-207,238-271`). Smaller values keep every structural
    # element (multi-period fold, spectral-norm scale 0, pooled scales,
    # feature losses) with a fraction of the graph — used by ablations and
    # the multichip dryrun's tiny wiring leg, where cold-compiling the full
    # 8-sub-D ensemble on a 1-core host dominated the driver budget.
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3


class VocoderTrainer:
    def __init__(self, h, config: VocoderTrainerConfig = VocoderTrainerConfig(), mesh=None):
        """h: AttrDict-compatible vocoder config (config_custom.json schema).

        mesh: optional `jax.sharding.Mesh` with a `data` axis. The global batch
        is sharded over it and XLA inserts the gradient all-reduce — the
        reference's DDP path for THIS trainer (`train.py:26-28,59-62,306-307`).
        """
        self.h = dict(h)
        self.cfg = config
        self.mesh = mesh
        if mesh is not None and self.h["batch_size"] % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size={self.h['batch_size']} must be divisible by the "
                f"mesh data axis ({mesh.shape['data']}) for batch sharding"
            )
        dtype = jnp.bfloat16 if config.bf16 else None
        self.generator = Generator(h=self.h, dtype=dtype)
        cat = config.concat_discriminators
        self.mpd = MultiPeriodDiscriminator(
            periods=tuple(config.mpd_periods), dtype=dtype, batch_concat=cat
        )
        self.msd = MultiScaleDiscriminator(
            num_scales=config.msd_scales, dtype=dtype, batch_concat=cat
        )
        self.use_orbax = (
            config.use_orbax
            if config.use_orbax is not None
            else jax.process_count() > 1
        )
        opt_dtype = jnp.bfloat16 if config.bf16_opt_state else None
        self.tx_g = _adabelief(self.h["learning_rate"], state_dtype=opt_dtype)
        self.tx_d = _adabelief(self.h["learning_rate"], state_dtype=opt_dtype)
        self.sched_g = ReduceLROnPlateau(self.h["learning_rate"], factor=0.1, patience=4)
        self.sched_d = ReduceLROnPlateau(self.h["learning_rate"], factor=0.1, patience=4)
        self._train_step = jax.jit(
            self._train_step_fn, donate_argnums=(0,), static_argnames=("fine_tuning",)
        )
        self._infer_mel = jax.jit(self._mel_for_loss)
        self._gen_forward = jax.jit(
            lambda params, x: self.generator.apply({"params": params}, x)
        )

    # -- state --------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> GanState:
        h = self.h
        seg_frames = h["segment_size"] // h["hop_size"]
        mel_shape = (1, h["num_mels"], seg_frames)
        audio_shape = (1, 1, h["segment_size"])
        r1, r2, r3 = jax.random.split(rng, 3)
        gen_vars = self.generator.init(r1, jnp.zeros(mel_shape))
        mpd_vars = self.mpd.init(r2, jnp.zeros(audio_shape), jnp.zeros(audio_shape))
        msd_vars = self.msd.init(r3, jnp.zeros(audio_shape), jnp.zeros(audio_shape))
        gen_params = gen_vars["params"]
        mpd_params = mpd_vars["params"]
        msd_params = msd_vars["params"]
        msd_stats = msd_vars.get("norm_stats", FrozenDict())
        state = GanState(
            gen_params=gen_params,
            mpd_params=mpd_params,
            msd_params=msd_params,
            msd_norm_stats=msd_stats,
            opt_g=self.tx_g.init(gen_params),
            opt_d=self.tx_d.init((mpd_params, msd_params)),
        )
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    # -- mels ----------------------------------------------------------------
    def _mel_input(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Generator-input mel (fmax-limited), scratch mode (`meldataset.py:192-194`)."""
        h = self.h
        return mel_spectrogram(
            audio, h["n_fft"], h["num_mels"], h["sampling_rate"], h["hop_size"],
            h["win_size"], h["fmin"], h["fmax"],
        )

    def _mel_for_loss(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Loss mel with fmax_for_loss (None -> full band) (`meldataset.py:220-224`)."""
        h = self.h
        return mel_spectrogram(
            audio, h["n_fft"], h["num_mels"], h["sampling_rate"], h["hop_size"],
            h["win_size"], h["fmin"], h.get("fmax_for_loss"),
        )

    # -- the step -------------------------------------------------------------
    def _train_step_fn(
        self,
        state: GanState,
        audio: jnp.ndarray,            # (B, L)
        mel_input: Optional[jnp.ndarray],  # (B, num_mels, F) in fine-tuning, else None
        lr_g: jnp.ndarray,
        lr_d: jnp.ndarray,
        *,
        fine_tuning: bool,
    ) -> Tuple[GanState, Dict[str, jnp.ndarray]]:
        y = audio[:, None, :]  # (B, 1, L)
        x = mel_input if fine_tuning else self._mel_input(audio)
        y_mel = self._mel_for_loss(audio)

        # single generator forward, vjp saved for the G-step pullback
        y_g_hat, gen_vjp = jax.vjp(
            lambda p: self.generator.apply({"params": p}, x), state.gen_params
        )
        y_g_hat_sg = jax.lax.stop_gradient(y_g_hat)

        # ---- D step ----
        def d_loss_fn(dparams):
            mpd_p, msd_p = dparams
            df_r, df_g, _, _ = self.mpd.apply({"params": mpd_p}, y, y_g_hat_sg)
            loss_f, _, _ = discriminator_loss(df_r, df_g)
            (ds_r, ds_g, _, _), msd_updates = self.msd.apply(
                {"params": msd_p, "norm_stats": state.msd_norm_stats},
                y, y_g_hat_sg, mutable=["norm_stats"],
            )
            loss_s, _, _ = discriminator_loss(ds_r, ds_g)
            return loss_f + loss_s, msd_updates["norm_stats"]

        (loss_disc_all, new_msd_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )((state.mpd_params, state.msd_params))
        if self.cfg.bf16_grads:
            d_grads = jax.tree_util.tree_map(_quantize_grad_bf16, d_grads)
        state.opt_d.hyperparams["learning_rate"] = lr_d
        d_updates, new_opt_d = self.tx_d.update(
            d_grads, state.opt_d, (state.mpd_params, state.msd_params)
        )
        new_mpd, new_msd = optax.apply_updates(
            (state.mpd_params, state.msd_params), d_updates
        )

        # ---- G step (uses the UPDATED discriminators, matching `train.py:152-188`) ----
        def g_loss_from_output(yh):
            yh_mel = self._mel_for_loss(yh[:, 0, :])
            loss_mel = jnp.mean(jnp.abs(y_mel - yh_mel)) * 45.0
            df_r, df_g, fmap_f_r, fmap_f_g = self.mpd.apply({"params": new_mpd}, y, yh)
            ds_r, ds_g, fmap_s_r, fmap_s_g = self.msd.apply(
                {"params": new_msd, "norm_stats": new_msd_stats}, y, yh
            )
            loss_fm_f = feature_loss(fmap_f_r, fmap_f_g)
            loss_fm_s = feature_loss(fmap_s_r, fmap_s_g)
            loss_gen_f, _ = generator_loss(df_g)
            loss_gen_s, _ = generator_loss(ds_g)
            total = loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f + loss_mel
            mel_err = jnp.mean(jnp.abs(y_mel - yh_mel))
            return total, mel_err

        (loss_gen_all, mel_error), dyh = jax.value_and_grad(
            g_loss_from_output, has_aux=True
        )(y_g_hat)
        (g_grads,) = gen_vjp(dyh)
        if self.cfg.bf16_grads:
            g_grads = jax.tree_util.tree_map(_quantize_grad_bf16, g_grads)
        state.opt_g.hyperparams["learning_rate"] = lr_g
        g_updates, new_opt_g = self.tx_g.update(g_grads, state.opt_g, state.gen_params)
        new_gen = optax.apply_updates(state.gen_params, g_updates)

        new_state = GanState(
            gen_params=new_gen,
            mpd_params=new_mpd,
            msd_params=new_msd,
            msd_norm_stats=new_msd_stats,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
        )
        metrics = {
            "loss_gen_all": loss_gen_all,
            "loss_disc_all": loss_disc_all,
            "mel_error": mel_error,
        }
        return new_state, metrics

    def train_step(self, state: GanState, batch: Dict[str, Any]) -> Tuple[GanState, Dict[str, float]]:
        if self.mesh is not None:
            put = lambda x: jax.device_put(
                np.asarray(x), batch_sharding(self.mesh, np.asarray(x).ndim, 0)
            )
        else:
            put = jnp.asarray
        audio = put(batch["audio"])
        mel = batch.get("mel")
        mel = put(mel) if mel is not None else None
        state, metrics = self._train_step(
            state, audio, mel,
            jnp.float32(self.sched_g.lr), jnp.float32(self.sched_d.lr),
            fine_tuning=self.cfg.fine_tuning,
        )
        return state, metrics

    # -- validation ------------------------------------------------------------
    def validation_mel_error(
        self, state: GanState, audio: np.ndarray, mel_input: Optional[np.ndarray]
    ) -> Tuple[float, np.ndarray]:
        """Full-utterance mel L1 (`train.py:219-253`), length-bucketed for jit.

        Pads the input mel to a frame bucket so XLA compiles O(1) programs, then
        trims the generated audio back to the true length before the loss mel.
        """
        h = self.h
        hop = h["hop_size"]
        if mel_input is None:
            # frames available for a center=False padded stft
            pad = int((h["n_fft"] - hop) / 2)
            frames = 1 + (audio.shape[-1] + 2 * pad - h["n_fft"]) // hop
            x_true = np.asarray(self._mel_input(jnp.asarray(audio[None, :])))[0]
        else:
            x_true = mel_input
            frames = x_true.shape[-1]
        bucket = 64
        padded = ((frames + bucket - 1) // bucket) * bucket
        x_pad = np.full((1, h["num_mels"], padded), np.log(1e-5), dtype=np.float32)
        x_pad[0, :, :frames] = x_true[:, :frames]
        y_hat = np.asarray(self._gen_forward(state.gen_params, jnp.asarray(x_pad)))
        y_hat_true = y_hat[0, 0, : frames * hop]

        # mel both signals at the bucketed length (O(1) compiled programs);
        # compare only frames whose analysis window lies fully inside the true
        # audio (excludes <=4 boundary frames vs the reference's min-trim —
        # deterministic and negligible for utterance-scale metrics)
        n = min(y_hat_true.shape[0], audio.shape[-1])
        L_pad = padded * hop
        a_pad = np.zeros((1, L_pad), dtype=np.float32)
        a_pad[0, :n] = audio[:n]
        yh_pad = np.zeros((1, L_pad), dtype=np.float32)
        yh_pad[0, : y_hat_true.shape[0]] = y_hat_true
        y_mel = np.asarray(self._infer_mel(jnp.asarray(a_pad)))
        yh_mel = np.asarray(self._infer_mel(jnp.asarray(yh_pad)))
        pad_stft = int((h["n_fft"] - hop) / 2)
        t_cmp = max(1, (n - (h["n_fft"] - pad_stft)) // hop + 1)
        t_cmp = min(t_cmp, y_mel.shape[-1], yh_mel.shape[-1])
        err = float(np.mean(np.abs(y_mel[..., :t_cmp] - yh_mel[..., :t_cmp])))
        return err, y_hat_true

    # -- checkpointing ----------------------------------------------------------
    def save(self, cp_dir: str, state: GanState, steps: int, epoch: int) -> None:
        g_path = os.path.join(cp_dir, f"g_{steps:08d}")
        do_path = os.path.join(cp_dir, f"do_{steps:08d}")
        if self.use_orbax:
            # multi-host: all processes participate (sharded orbax dirs with
            # the same g_/do_ naming, so scan_checkpoint resume still works)
            ckpt_io.save_train_state_orbax(
                g_path, {"generator": state.gen_params}, {}
            )
            ckpt_io.save_train_state_orbax(
                do_path,
                {
                    "mpd": state.mpd_params,
                    "msd": state.msd_params,
                    "msd_norm_stats": state.msd_norm_stats,
                    "optim_g": state.opt_g,
                    "optim_d": state.opt_d,
                },
                {"steps": int(steps), "epoch": int(epoch)},
            )
            return
        if not host_is_primary():  # rank-0 gating (`train.py:190`)
            return
        ckpt_io.save_checkpoint(g_path, {"generator": jax.device_get(state.gen_params)})
        ckpt_io.save_checkpoint(
            do_path,
            {
                "mpd": jax.device_get(state.mpd_params),
                "msd": jax.device_get(state.msd_params),
                "msd_norm_stats": jax.device_get(state.msd_norm_stats),
                "optim_g": jax.device_get(state.opt_g),
                "optim_d": jax.device_get(state.opt_d),
                "steps": np.int64(steps),
                "epoch": np.int64(epoch),
            },
        )

    def resume(self, cp_dir: str, state: GanState) -> Tuple[GanState, int, int]:
        """Scan cp_dir for g_/do_ pairs and restore; returns (state, steps, last_epoch)."""
        cp_g = ckpt_io.scan_checkpoint(cp_dir, "g_")
        cp_do = ckpt_io.scan_checkpoint(cp_dir, "do_")
        if cp_g is None or cp_do is None:
            return state, 0, -1
        if ckpt_io.is_orbax_checkpoint(cp_g):
            g_arrays, _ = ckpt_io.restore_train_state_orbax(
                cp_g, {"generator": state.gen_params}
            )
            do_arrays, do_meta = ckpt_io.restore_train_state_orbax(
                cp_do,
                {
                    "mpd": state.mpd_params,
                    "msd": state.msd_params,
                    "msd_norm_stats": state.msd_norm_stats,
                    "optim_g": state.opt_g,
                    "optim_d": state.opt_d,
                },
            )
            new_state = GanState(
                gen_params=g_arrays["generator"],
                mpd_params=do_arrays["mpd"],
                msd_params=do_arrays["msd"],
                msd_norm_stats=do_arrays["msd_norm_stats"],
                opt_g=do_arrays["optim_g"],
                opt_d=do_arrays["optim_d"],
            )
            return new_state, int(do_meta.get("steps", 0)) + 1, int(do_meta.get("epoch", 0))
        g_obj = ckpt_io.load_checkpoint(cp_g, {"generator": jax.device_get(state.gen_params)})
        do_template = {
            "mpd": jax.device_get(state.mpd_params),
            "msd": jax.device_get(state.msd_params),
            "msd_norm_stats": jax.device_get(state.msd_norm_stats),
            "optim_g": jax.device_get(state.opt_g),
            "optim_d": jax.device_get(state.opt_d),
            "steps": np.int64(0),
            "epoch": np.int64(0),
        }
        do_obj = ckpt_io.load_checkpoint(cp_do, do_template)
        new_state = GanState(
            gen_params=g_obj["generator"],
            mpd_params=do_obj["mpd"],
            msd_params=do_obj["msd"],
            msd_norm_stats=do_obj["msd_norm_stats"],
            opt_g=do_obj["optim_g"],
            opt_d=do_obj["optim_d"],
        )
        if self.mesh is not None:
            new_state = replicate(new_state, self.mesh)
        return new_state, int(do_obj["steps"]) + 1, int(do_obj["epoch"])
