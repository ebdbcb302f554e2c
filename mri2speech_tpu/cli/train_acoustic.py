"""Acoustic-model training CLI.

Parity target `train_mri_acoustic_model.py:544-623` (argument surface and
behavior). Differences (all documented):
* `--num_workers`/`--prefetch_factor` map to the loader's prefetch depth (no
  worker processes needed — batches are gathered from mmaps on a thread while
  the device steps)
* `--ckpt_segments`/`--use_reentrant` are accepted for CLI compatibility but
  remat needs no segmenting under XLA (`--use_checkpoint` alone enables it)
* `--bf16` enables bfloat16 compute (no GradScaler machinery — TPU bf16 needs
  none)
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from mri2speech_tpu.data.dataset import BatchLoader, FixedLenPairDataset, split_indices
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.train.acoustic import AcousticTrainer, AcousticTrainerConfig


def make_loaders(
    processed_dir: str,
    ref_frames: int,
    batch_size: int = 8,
    val_bs: int = 8,
    prefetch: int = 2,
    seed: int = 42,
):
    """80/10/10 split loaders (`train_mri_acoustic_model.py:173-206`)."""
    ds = FixedLenPairDataset(processed_dir, ref_frames=ref_frames)
    tr, va, te = split_indices(len(ds), seed=seed)
    train_loader = BatchLoader(ds, tr, batch_size, shuffle=True, drop_last=True, prefetch=prefetch)
    val_loader = BatchLoader(ds, va, val_bs, shuffle=False, drop_last=False, prefetch=prefetch)
    test_loader = BatchLoader(ds, te, val_bs, shuffle=False, drop_last=False, prefetch=prefetch)
    return train_loader, val_loader, test_loader


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--processed_dir", type=str, required=True)
    ap.add_argument("--out_ckpt", type=str, default="best_mri_acoustic_model.ckpt")
    ap.add_argument("--resume_ckpt", type=str, default=None)
    ap.add_argument("--log_dir", type=str, default=None)
    ap.add_argument("--ref_frames", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--val_batch_size", type=int, default=8)
    ap.add_argument("--micro_batch_size", type=int, default=2)
    ap.add_argument("--num_workers", type=int, default=0)
    ap.add_argument("--prefetch_factor", type=int, default=4)
    ap.add_argument("--max_train_steps", type=int, default=None)
    ap.add_argument("--max_val_steps", type=int, default=None)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--grad_clip", type=float, default=1.0)
    ap.add_argument("--cnn_pretrained", action="store_true")
    ap.add_argument("--use_checkpoint", action="store_true",
                    help="Enable gradient rematerialisation of the CNN encoder.")
    ap.add_argument("--ckpt_segments", type=int, default=2,
                    help="Accepted for reference-CLI compat; remat needs no segmenting.")
    ap.add_argument("--use_reentrant", action="store_true",
                    help="Accepted for reference-CLI compat; no-op under XLA remat.")
    ap.add_argument("--bf16", action="store_true", help="bfloat16 compute.")
    ap.add_argument(
        "--stem_s2d", action="store_true",
        help="Space-to-depth stem conv (EXACT rewrite, faster on TPU; see "
             "models/effnetv2.py). Off by default to match the reference "
             "layout bit-for-bit.",
    )
    ap.add_argument(
        "--pad_ir", action="store_true",
        help="128-lane zero-padding of the ir stages (EXACT inference "
             "transform; engages only in eval/validation passes — the "
             "training graph is unchanged). Speeds up the validation "
             "forward; see models/effnetv2.py::_PaddedInvertedResidual.",
    )
    ap.add_argument(
        "--no_preempt_guard", action="store_true",
        help="Disable SIGTERM/SIGINT-triggered emergency checkpointing "
             "(on by default: a preemption notice saves a full-resume "
             "snapshot to <out_ckpt>.preempt, auto-resumed next run).",
    )
    ap.add_argument(
        "--num_devices", type=int, default=1,
        help="Data-parallel device count; 0 = all available, 1 = single "
             "device (the reference's acoustic trainer is single-device; DP "
             "here shards the micro-batch dim over the mesh `data` axis).",
    )
    ap.add_argument(
        "--model_devices", type=int, default=1,
        help="Tensor-parallel width: this many of --num_devices form the "
             "mesh `model` axis (BiLSTM fused-gate matrices and the mel head "
             "shard over it, parallel/mesh.py::acoustic_param_sharding). "
             "1 = pure DP (reference parity; the reference has no TP).",
    )
    from mri2speech_tpu.parallel.mesh import (
        add_distributed_flags,
        initialize_distributed_from_args,
    )

    add_distributed_flags(ap)
    args = ap.parse_args()

    # BEFORE any jax.devices() touch: afterwards the device list is global
    initialize_distributed_from_args(args)

    if not os.path.isdir(args.processed_dir):
        raise FileNotFoundError(f"{args.processed_dir} not found. Run preprocess first.")

    train_loader, val_loader, _ = make_loaders(
        args.processed_dir, args.ref_frames,
        batch_size=args.batch_size, val_bs=args.val_batch_size,
        prefetch=max(1, args.prefetch_factor // 2),
    )
    print(f"[DATALOADER] batches/epoch={len(train_loader)} prefetch={args.prefetch_factor}")

    model = AcousticModel(
        n_mels=64,
        rnn_hidden=640,
        dropout=0.5,
        use_checkpoint=args.use_checkpoint,
        stem_s2d=args.stem_s2d,
        pad_ir=args.pad_ir,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.cnn_pretrained:
        print(
            "[WARN] --cnn_pretrained: convert timm weights offline with "
            "tools/convert_torch_checkpoint.py and pass them via --resume_ckpt."
        )

    from mri2speech_tpu.parallel.mesh import resolve_mesh

    mesh = resolve_mesh(args.num_devices, args.model_devices)
    if mesh is not None:
        print(
            f"[MESH] data={mesh.shape['data']} x model={mesh.shape['model']} "
            f"devices"
        )

    from mri2speech_tpu.train.preempt import PreemptionGuard, maybe_resume_path

    guard = None if args.no_preempt_guard else PreemptionGuard().install()
    trainer = AcousticTrainer(
        model,
        AcousticTrainerConfig(
            lr=args.lr,
            weight_decay=args.weight_decay,
            grad_clip=args.grad_clip,
            micro_batch_size=args.micro_batch_size,
            max_train_steps=args.max_train_steps,
            max_val_steps=args.max_val_steps,
        ),
        log_dir=os.path.abspath(args.log_dir) if args.log_dir else None,
        mesh=mesh,
        preempt=guard,
    )

    sample = next(iter(val_loader))
    state = trainer.init_state(sample)

    # resolve the run's effective checkpoint FIRST (an explicit --resume_ckpt
    # with the default --out_ckpt continues that lineage, as before), so the
    # emergency snapshot is namespaced to the checkpoint this run actually
    # writes — not to an unrelated default path
    explicit = os.path.abspath(args.resume_ckpt) if args.resume_ckpt else None
    if explicit and args.out_ckpt == "best_mri_acoustic_model.ckpt":
        args.out_ckpt = explicit
    emergency_path = os.path.abspath(args.out_ckpt) + ".preempt"
    resume_path = maybe_resume_path(explicit, emergency_path)
    if resume_path:
        if not os.path.exists(resume_path):
            raise FileNotFoundError(f"Resume checkpoint {resume_path} not found.")
        if resume_path == emergency_path:
            print(f"[PREEMPT] Auto-resuming from emergency snapshot {resume_path}")
        state, _ = trainer.resume_from_checkpoint(resume_path, state)

    try:
        trainer.fit(
            state, train_loader, val_loader, epochs=args.epochs,
            save_path=args.out_ckpt, emergency_path=emergency_path,
        )
    finally:
        if guard is not None:
            guard.uninstall()
    if trainer.writer:
        trainer.writer.close()
    if guard is not None and guard.triggered:
        print("[DONE] Interrupted by preemption; resume to continue.")
    else:
        print("[DONE] Done. Saved:", args.out_ckpt)


if __name__ == "__main__":
    main()
