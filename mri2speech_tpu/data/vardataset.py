"""Variable-length MRI/mel dataset with replication padding.

Parity target `dataset.py:14-137` (MRIMelDataset + collate_pad): pairs
`<stem>_video.npy` / `<stem>_audio.npy` (+ optional `<stem>_meta.json`) by
stem, trims to common T, optional fixed `sequence_length` with LAST-FRAME
REPLICATION padding, collate pads the batch to max T the same way
(mask 1=valid, 0=padded).

Framework-free numpy implementation; batches feed the jitted eval/train steps
directly. For static-shape jit friendliness, `collate_pad` accepts a
`pad_to_multiple` so batch time-lengths quantise to a few compiled programs.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def gather_items(processed_dir: str) -> List[Dict[str, str]]:
    """Collect {video, audio, meta} triplets by stem suffix convention."""
    by_stem: Dict[str, Dict[str, str]] = {}
    for f in os.listdir(processed_dir):
        path = os.path.join(processed_dir, f)
        stem, _ext = os.path.splitext(f)
        if stem.endswith("_video"):
            by_stem.setdefault(stem[:-6], {})["video"] = path
        elif stem.endswith("_audio"):
            by_stem.setdefault(stem[:-6], {})["audio"] = path
        elif stem.endswith("_meta"):
            by_stem.setdefault(stem[:-5], {})["meta"] = path
    items = [v for v in by_stem.values() if "video" in v and "audio" in v]
    items.sort(key=lambda d: os.path.basename(d["video"]))
    return items


class MRIMelDataset:
    def __init__(
        self,
        processed_dir: str,
        sequence_length: Optional[int] = None,
        use_mask: bool = True,
    ) -> None:
        self.processed_dir = processed_dir
        self.sequence_length = sequence_length
        self.use_mask = use_mask
        self.items = gather_items(processed_dir)
        if not self.items:
            raise RuntimeError(
                f"No matched pairs found in {processed_dir}. "
                f"Expected files like <stem>_video.npy and <stem>_audio.npy"
            )

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict[str, object]:
        it = self.items[idx]
        video = np.load(it["video"]).astype(np.float32)  # (T, H, W)
        mel = np.load(it["audio"]).astype(np.float32)    # (T, n_mels)
        meta = None
        if "meta" in it and os.path.exists(it["meta"]):
            with open(it["meta"], "r") as f:
                meta = json.load(f)

        T = min(video.shape[0], mel.shape[0])
        video, mel = video[:T], mel[:T]

        if self.sequence_length is not None:
            target_T = self.sequence_length
            if T >= target_T:
                video, mel = video[:target_T], mel[:target_T]
                mask = np.ones((target_T,), dtype=np.float32)
            else:
                pad = target_T - T
                video = np.concatenate([video, np.repeat(video[-1:], pad, axis=0)])
                mel = np.concatenate([mel, np.repeat(mel[-1:], pad, axis=0)])
                mask = np.concatenate(
                    [np.ones((T,), np.float32), np.zeros((pad,), np.float32)]
                )
        else:
            mask = np.ones((T,), dtype=np.float32)

        return {
            "mri": video[:, None, :, :],  # (T, 1, H, W)
            "mel": mel,
            "mask": mask if self.use_mask else None,
            "meta": meta,
        }


def collate_pad(
    batch: List[Dict[str, object]], pad_to_multiple: int = 1
) -> Dict[str, object]:
    """Pad a variable-length batch to max T via last-frame replication."""
    T_max = max(x["mri"].shape[0] for x in batch)
    if pad_to_multiple > 1:
        T_max = ((T_max + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    B = len(batch)
    _, _, H, W = batch[0]["mri"].shape
    n_mels = batch[0]["mel"].shape[1]

    mri_out = np.empty((B, T_max, 1, H, W), dtype=np.float32)
    mel_out = np.empty((B, T_max, n_mels), dtype=np.float32)
    mask_out = np.zeros((B, T_max), dtype=np.float32)
    metas = []
    for i, x in enumerate(batch):
        T = x["mri"].shape[0]
        mri_out[i, :T] = x["mri"]
        mel_out[i, :T] = x["mel"]
        mask_out[i, :T] = 1.0 if x.get("mask") is None else x["mask"]
        if T < T_max:
            mri_out[i, T:] = x["mri"][-1:]
            mel_out[i, T:] = x["mel"][-1:]
        metas.append(x.get("meta"))
    return {"mri": mri_out, "mel": mel_out, "mask": mask_out, "meta": metas}
