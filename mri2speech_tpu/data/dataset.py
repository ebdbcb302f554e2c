"""Fixed-length pair dataset: mmap-backed, index-cached, framework-free.

Parity target `dataset_fixedlen.py:37-268`:
* dual mode: `pairs_ref{N}_npy/<stem>/{mri,mel,mask}.npy` (mmap) or
  `pairs_ref{N}/*.npz`
* persisted index cache `index_ref{N}.txt/json`, natural-sort ordering
* cumulative-count -> bisect global->(file, local) mapping
* strict shape guards (T == ref_frames, 256x256) with skip-to-next fallback
* deterministic 80/10/10 split (seed 42) matching
  `train_mri_acoustic_model.py:179-183`

TPU-first difference: instead of a per-sample `__getitem__` + collate, batches
are gathered directly from the memmaps into contiguous numpy arrays (one fancy-
index per file segment), and a background thread double-buffers the next batch
while the device computes — the host-side analogue of the DMA double-buffering
pattern. An optional C++ gather kernel (runtime/) accelerates the copy.
"""
from __future__ import annotations

import bisect
import json
import threading
import queue as queue_mod
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def natural_key(s: str) -> List[object]:
    """Natural sort key: digit runs compare numerically (`dataset_fixedlen.py:13-27`)."""
    tokens: List[object] = []
    start = 0
    for idx, ch in enumerate(s):
        if ch.isdigit():
            if start < idx:
                tokens.append(s[start:idx])
            j = idx
            while j < len(s) and s[j].isdigit():
                j += 1
            tokens.append(int(s[idx:j]))
            start = j
    if start < len(s):
        tokens.append(s[start:])
    return tokens


def split_indices(n: int, seed: int = 42) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """80/10/10 random split with torch.random_split-compatible *sizes*.

    Sizes follow `train_mri_acoustic_model.py:179-183` (int truncation). The
    permutation itself is numpy-seeded (our RNG stack), deterministic per seed.
    """
    n_train = int(n * 0.8)
    n_val = int(n * 0.1)
    perm = np.random.default_rng(seed).permutation(n)
    return (
        perm[:n_train],
        perm[n_train : n_train + n_val],
        perm[n_train + n_val :],
    )


class FixedLenPairDataset:
    """Indexable (mri, mel, mask) pair store over pairs_ref{N}[_npy]."""

    def __init__(
        self,
        processed_dir: str,
        ref_frames: int,
        *,
        strict_T: bool = True,
        allow_broken_skip: bool = True,
        debug_print: bool = False,
        cache_index: bool = True,
        force_reindex: bool = False,
        expected_hw: Tuple[int, int] = (256, 256),
    ) -> None:
        self.processed_dir = Path(processed_dir)
        self.ref_frames = int(ref_frames)
        self.strict_T = strict_T
        self.allow_broken_skip = allow_broken_skip
        self.debug_print = debug_print
        self.cache_index = cache_index
        self.force_reindex = force_reindex
        self.expected_hw = expected_hw

        self.pairs_dir = self.processed_dir / f"pairs_ref{self.ref_frames}"
        self.npy_dir = self.processed_dir / f"pairs_ref{self.ref_frames}_npy"
        if not self.pairs_dir.is_dir() and not self.npy_dir.is_dir():
            raise FileNotFoundError(f"{self.pairs_dir} not found")

        self._mmaps: Dict[int, Dict[str, np.ndarray]] = {}
        self.records: List[Dict[str, str]] = []
        self.counts: List[int] = []
        self.cumsum: List[int] = [0]

        if self.npy_dir.is_dir():
            self.mode = "npy"
            self._index_npy()
        else:
            self.mode = "npz"
            self._index_npz()
        self.total_pairs = self.cumsum[-1]
        if self.total_pairs == 0:
            raise RuntimeError(f"No pairs available in {self.processed_dir}")

    # -- indexing ----------------------------------------------------------
    def _index_npy(self) -> None:
        dirs = sorted(
            (p for p in self.npy_dir.iterdir() if p.is_dir()),
            key=lambda p: natural_key(p.name),
        )
        if not dirs:
            raise RuntimeError(f"No directories in {self.npy_dir}")
        for folder in dirs:
            triplet = {k: folder / f"{k}.npy" for k in ("mri", "mel", "mask")}
            if not all(p.is_file() for p in triplet.values()):
                self._note(f"skip (missing npy): {folder}")
                continue
            try:
                mri = np.load(triplet["mri"], mmap_mode="r", allow_pickle=False)
                if mri.ndim != 5:
                    raise ValueError("unexpected ndim")
                n_pairs, T = int(mri.shape[0]), int(mri.shape[1])
                del mri
                # the fast-path gather trusts these shapes (no per-row
                # validation, native memcpy has no bounds check) — a
                # truncated mel/mask write must be caught HERE, not read
                # out-of-bounds at training time
                for k in ("mel", "mask"):
                    arr = np.load(triplet[k], mmap_mode="r", allow_pickle=False)
                    if int(arr.shape[0]) != n_pairs:
                        raise ValueError(
                            f"{k}.npy has {arr.shape[0]} rows, mri.npy has "
                            f"{n_pairs}"
                        )
                    del arr
            except Exception as exc:
                if not self.allow_broken_skip:
                    raise
                self._note(f"skip (load error): {folder} reason={exc}")
                continue
            if n_pairs == 0:
                continue
            if self.strict_T and T != self.ref_frames:
                if not self.allow_broken_skip:
                    raise RuntimeError(f"T mismatch in {folder}")
                self._note(f"skip (T mismatch): {folder}")
                continue
            self.records.append({k: str(v) for k, v in triplet.items()})
            self.counts.append(n_pairs)
            self.cumsum.append(self.cumsum[-1] + n_pairs)

    def _index_npz(self) -> None:
        cache_txt = self.pairs_dir / f"index_ref{self.ref_frames}.txt"
        cache_json = self.pairs_dir / f"index_ref{self.ref_frames}.json"
        files: List[str] = []
        if self.cache_index and not self.force_reindex:
            for cache in (cache_txt, cache_json):
                if cache.is_file():
                    try:
                        text = cache.read_text(encoding="utf-8")
                        files = (
                            json.loads(text)
                            if cache.suffix == ".json"
                            else [ln.strip() for ln in text.splitlines() if ln.strip()]
                        )
                        break
                    except Exception:
                        files = []
        if not files:
            cands = list(self.pairs_dir.glob("*.npz")) + list(self.pairs_dir.glob("*/*.npz"))
            if not cands:
                cands = list(self.pairs_dir.rglob("*.npz"))
            files = sorted({str(p) for p in cands}, key=natural_key)
            if self.cache_index and files:
                try:
                    cache_txt.write_text("\n".join(files), encoding="utf-8")
                    cache_json.write_text(json.dumps(files), encoding="utf-8")
                except Exception:
                    pass
        if not files:
            raise RuntimeError(f"No .npz pairs found in {self.pairs_dir}")

        for fp in files:
            try:
                with np.load(fp, mmap_mode="r", allow_pickle=False) as data:
                    mri = data["mri"]
                    if mri.ndim != 5:
                        raise ValueError(f"Unexpected ndim {mri.ndim}")
                    n_pairs, T = int(mri.shape[0]), int(mri.shape[1])
                    if self.strict_T and T != self.ref_frames:
                        raise ValueError(f"T mismatch {T}")
            except Exception as exc:
                if not self.allow_broken_skip:
                    raise
                self._note(f"skip (index): {fp} reason={exc}")
                continue
            if n_pairs <= 0:
                continue
            self.records.append({"npz": fp})
            self.counts.append(n_pairs)
            self.cumsum.append(self.cumsum[-1] + n_pairs)

    def _note(self, msg: str) -> None:
        if self.debug_print:
            print(f"[DATASET] {msg}")

    # -- access ------------------------------------------------------------
    def __len__(self) -> int:
        return self.total_pairs

    def _map_index(self, idx: int) -> Tuple[int, int]:
        if idx < 0:
            idx += self.total_pairs
        if not (0 <= idx < self.total_pairs):
            raise IndexError(idx)
        file_idx = bisect.bisect_right(self.cumsum, idx) - 1
        return file_idx, idx - self.cumsum[file_idx]

    def _arrays(self, file_idx: int) -> Dict[str, np.ndarray]:
        arrs = self._mmaps.get(file_idx)
        if arrs is None:
            rec = self.records[file_idx]
            if self.mode == "npy":
                arrs = {
                    k: np.load(rec[k], mmap_mode="r", allow_pickle=False)
                    for k in ("mri", "mel", "mask")
                }
            else:
                # npz members aren't mmap-able per-entry across context exits;
                # load eagerly once per file and cache (bounded by corpus size)
                with np.load(rec["npz"], allow_pickle=False) as data:
                    arrs = {k: np.asarray(data[k]) for k in ("mri", "mel", "mask")}
            self._mmaps[file_idx] = arrs
        return arrs

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        file_idx, local = self._map_index(index)
        arrs = self._arrays(file_idx)
        item = {k: np.asarray(arrs[k][local]) for k in ("mri", "mel", "mask")}
        if not self._valid(item):
            if self.allow_broken_skip:
                return self[(index + 1) % self.total_pairs]
            raise RuntimeError("broken sample")
        return item

    def _valid(self, item: Dict[str, np.ndarray]) -> bool:
        if self.strict_T:
            T = self.ref_frames
            if not (item["mri"].shape[0] == item["mel"].shape[0] == item["mask"].shape[0] == T):
                return False
        H, W = int(item["mri"].shape[-2]), int(item["mri"].shape[-1])
        return (H, W) == self.expected_hw

    def gather_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Contiguous batch gather, grouped per backing file for mmap locality.

        npy-mmap mode uses the native C++ row gather (runtime/gather.cpp) when
        built — one memcpy sweep per (file, key) instead of per-item Python
        indexing; falls back to numpy fancy indexing otherwise. Shape guards
        hold structurally in npy mode (homogeneous per-file arrays validated at
        index time), so the per-item skip path is only needed for npz mode.
        """
        if self.mode == "npy":
            from collections import defaultdict

            from mri2speech_tpu.runtime.native import gather_rows

            by_file: Dict[int, list] = defaultdict(list)
            for pos, idx in enumerate(indices):
                fi, loc = self._map_index(int(idx))
                by_file[fi].append((pos, loc))
            out: Optional[Dict[str, np.ndarray]] = None
            for fi, entries in by_file.items():
                arrs = self._arrays(fi)
                positions = np.asarray([p for p, _ in entries])
                locs = np.asarray([l for _, l in entries], dtype=np.int64)
                for k in ("mri", "mel", "mask"):
                    rows = gather_rows(np.asarray(arrs[k]), locs)
                    if out is None:
                        out = {}
                    if k not in out:
                        out[k] = np.empty(
                            (len(indices),) + rows.shape[1:], dtype=rows.dtype
                        )
                    out[k][positions] = rows
            assert out is not None
            return out

        order = np.argsort([self._map_index(int(i))[0] for i in indices], kind="stable")
        out = None
        for pos in order:
            idx = int(indices[int(pos)])
            item = self[idx]
            if out is None:
                out = {
                    k: np.empty((len(indices),) + v.shape, dtype=v.dtype)
                    for k, v in item.items()
                }
            for k, v in item.items():
                out[k][int(pos)] = v
        assert out is not None
        return out


class BatchLoader:
    """Shuffled epoch batcher with background prefetch (double-buffering).

    Replaces torch DataLoader+collate (`train_mri_acoustic_model.py:173-206`):
    drop_last on train, sequential on eval. `prefetch` batches are prepared by a
    daemon thread while the device steps.
    """

    def __init__(
        self,
        dataset: FixedLenPairDataset,
        indices: Sequence[int],
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ) -> None:
        self.dataset = dataset
        self.indices = np.asarray(indices, dtype=np.int64)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        idx = self.indices
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            idx = idx[rng.permutation(len(idx))]
        batches = []
        stop = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        for s in range(0, stop, self.batch_size):
            batches.append(idx[s : s + self.batch_size])
        if not self.drop_last and stop < len(idx) and len(idx) % self.batch_size:
            pass  # already included by range over stop=len(idx)
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batch_indices()
        if self.prefetch <= 0:
            for b in batches:
                yield self.dataset.gather_batch(b)
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()  # consumer gone: unblock + kill the worker
        error: list = [None]

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer stopped iterating
            (max_train_steps / early-stop / preemption breaks abandon the
            generator — without this the worker blocks on a full queue
            forever, leaking a thread + pinned batches per epoch and
            contending with the next timed step on this 1-core host)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            try:
                for b in batches:
                    if not _put(self.dataset.gather_batch(b)):
                        return
            except BaseException as exc:  # propagate into the consumer
                error[0] = exc
            finally:
                _put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            if error[0] is not None:
                # a gather error with prefetch=0 would propagate; make the
                # threaded path behave identically instead of silently
                # truncating the epoch
                raise error[0]
        finally:
            stop.set()
