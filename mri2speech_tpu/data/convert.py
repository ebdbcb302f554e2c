"""Pair-store converters.

* npz -> per-stem npy directories for mmap loading
  (`scripts/convert_pairs_to_npy.py:7-36`)
* repack flat npz files into 3-digit video-ID subdirectories
  (`repack_pairs.py:5-28`)
"""
from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import numpy as np


def convert_npz_to_npy(pairs_dir: Path, output_dir: Path, overwrite: bool = False) -> int:
    output_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(pairs_dir.glob("*.npz")) or sorted(pairs_dir.glob("*/*.npz"))
    if not files:
        raise SystemExit(f"No .npz files found in {pairs_dir}")

    converted = 0
    for idx, npz_path in enumerate(files, 1):
        target_dir = output_dir / npz_path.stem
        target_dir.mkdir(parents=True, exist_ok=True)
        outs = {k: target_dir / f"{k}.npy" for k in ("mri", "mel", "mask")}
        if not overwrite and all(p.exists() for p in outs.values()):
            continue
        with np.load(npz_path, allow_pickle=False) as data:
            for key, out in outs.items():
                np.save(out, data[key], allow_pickle=False)
        converted += 1
    return converted


def repack_pairs_by_video(pairs_dir: str, dry_run: bool = False) -> int:
    """Move NNN_*.npz into per-video-ID subdirs (3-digit prefix)."""
    root = Path(pairs_dir)
    if not root.is_dir():
        raise FileNotFoundError(pairs_dir)
    moved = 0
    for fp in sorted(root.glob("*.npz")):
        vid = fp.name.split("_")[0]
        if not (vid.isdigit() and len(vid) == 3):
            continue
        dst = root / vid / fp.name
        if dst.exists():
            continue
        if not dry_run:
            dst.parent.mkdir(exist_ok=True)
            shutil.move(str(fp), str(dst))
        moved += 1
    return moved


def main() -> None:
    parser = argparse.ArgumentParser(description="Convert pair npz files to mmap-able npy.")
    parser.add_argument("--processed_dir", type=Path, required=True)
    parser.add_argument("--ref_frames", type=int, default=4)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args()
    pairs_dir = args.processed_dir / f"pairs_ref{args.ref_frames}"
    output_dir = args.processed_dir / f"pairs_ref{args.ref_frames}_npy"
    n = convert_npz_to_npy(pairs_dir, output_dir, overwrite=args.overwrite)
    print(f"converted {n} npz files -> {output_dir}")


if __name__ == "__main__":
    main()
