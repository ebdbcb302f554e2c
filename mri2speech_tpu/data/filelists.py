"""HiFi-GAN filelist builder (`scripts/create_rtmri_filelists.py:1-37`).

Shuffles wavs with a seeded RNG (default 42), holds out `valid_ratio` for
validation, writes `stem|dummy|dummy` lines to training.txt / validation.txt.
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path
from typing import Tuple


def create_filelists(
    wav_dir: Path, output_dir: Path, valid_ratio: float = 0.1, seed: int = 42
) -> Tuple[Path, Path]:
    wav_paths = sorted(p for p in wav_dir.glob("*.wav") if p.is_file())
    if not wav_paths:
        raise SystemExit(f"No wav files found in {wav_dir}")
    rng = random.Random(seed)
    rng.shuffle(wav_paths)
    valid_count = max(1, int(len(wav_paths) * valid_ratio))
    valid_paths, train_paths = wav_paths[:valid_count], wav_paths[valid_count:]

    output_dir.mkdir(parents=True, exist_ok=True)
    train_file = output_dir / "training.txt"
    valid_file = output_dir / "validation.txt"
    for paths, dest in ((train_paths, train_file), (valid_paths, valid_file)):
        with dest.open("w", encoding="utf-8") as f:
            for path in paths:
                f.write(f"{path.stem}|dummy|dummy\n")
    print(f"Wrote {len(train_paths)} training entries to {train_file}")
    print(f"Wrote {len(valid_paths)} validation entries to {valid_file}")
    return train_file, valid_file


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Create HiFi-GAN training/validation filelists from wav directory"
    )
    parser.add_argument("wav_dir", type=Path)
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--valid-ratio", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()
    create_filelists(args.wav_dir, args.output_dir, args.valid_ratio, args.seed)


if __name__ == "__main__":
    main()
