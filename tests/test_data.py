"""Data-layer tests: synthetic corpus -> preprocess -> pairs -> datasets."""
import json
import math
from pathlib import Path

import numpy as np
import pytest

from mri2speech_tpu.data import audio_io
from mri2speech_tpu.data.convert import convert_npz_to_npy, repack_pairs_by_video
from mri2speech_tpu.data.dataset import BatchLoader, FixedLenPairDataset, natural_key, split_indices
from mri2speech_tpu.data.filelists import create_filelists
from mri2speech_tpu.data.meldata import MelDataset, get_dataset_filelist
from mri2speech_tpu.data.preprocess import (
    build_pairs,
    compute_corpus_stats,
    compute_mel_db_host,
    save_sample,
)

SR, HOP = 11413, 420


def _write_wav(path: Path, seconds: float, freq: float = 220.0, sr: int = SR):
    t = np.arange(int(seconds * sr)) / sr
    y = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    audio_io.write_wav(str(path), sr, (y * 32767).astype(np.int16))
    return y


def _write_video(path: Path, n_frames: int, hw=(256, 256)):
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    w = cv2.VideoWriter(str(path), fourcc, 27.17, (hw[1], hw[0]))
    assert w.isOpened(), "cv2 VideoWriter failed to open"
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        frame = (rng.random((hw[0], hw[1], 3)) * 255).astype(np.uint8)
        w.write(frame)
    w.release()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Two synthetic utterances: avi video + aligned tone wav."""
    root = tmp_path_factory.mktemp("corpus")
    data = root / "data"
    data.mkdir()
    for stem, seconds, frames in (("001_utt", 1.5, 40), ("002_utt", 1.2, 32)):
        _write_wav(data / f"{stem}.wav", seconds)
        _write_video(data / f"{stem}.avi", frames)
    return data


@pytest.fixture(scope="module")
def processed(corpus, tmp_path_factory):
    from mri2speech_tpu.data.preprocess import make_parser, run_preprocess

    out = tmp_path_factory.mktemp("processed")
    args = make_parser().parse_args(
        [
            "--data_dir", str(corpus),
            "--out_dir", str(out),
            "--video_exts", ".avi",
        ]
    )
    run_preprocess(args)
    return out


def test_preprocess_outputs(processed):
    assert (processed / "scaler.json").is_file()
    assert (processed / "meta.json").is_file()
    meta = json.loads((processed / "meta.json").read_text())
    assert meta["sr"] == SR and meta["hop_length"] == HOP
    for stem in meta["stems"]:
        d = processed / "samples" / stem
        mri = np.load(d / "mri.npy")
        mel = np.load(d / "mel_db.npy")
        mask = np.load(d / "mask.npy")
        assert mri.shape[0] == mel.shape[0] == mask.shape[0]
        assert mri.shape[1:] == (256, 256)
        assert mel.shape[1] == 64
        # alignment invariant: T <= floor(samples/hop)
        assert mri.shape[0] <= math.floor(1.5 * SR / HOP) + 1

    pairs = sorted((processed / "pairs_ref4").glob("*.npz"))
    assert len(pairs) == 2
    with np.load(pairs[0]) as z:
        P, T = z["mri"].shape[:2]
        assert T == 4
        assert z["mri"].shape[2:] == (1, 256, 256)
        assert z["mel"].shape == (P, 4, 64)
        assert z["mask"].shape == (P, 4)


def test_scaler_roundtrip(processed):
    from mri2speech_tpu.ops.scaler import MelScaler

    scaler = MelScaler.load(processed / "scaler.json")
    assert scaler.n_mels == 64
    x = np.random.default_rng(0).standard_normal((5, 64)).astype(np.float32)
    back = np.asarray(scaler.denormalize(scaler.normalize(x)))
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_pairs_zscore_consistency(processed):
    """Pair mels must equal z-scored sample mels windowed at the same offsets."""
    from mri2speech_tpu.ops.scaler import MelScaler

    meta = json.loads((processed / "meta.json").read_text())
    stem = meta["stems"][0]
    scaler = MelScaler.load(processed / "scaler.json")
    mel = np.load(processed / "samples" / stem / "mel_db.npy")
    mel_std = (mel - scaler.mean) / scaler.std
    with np.load(processed / f"pairs_ref4/{stem}.npz") as z:
        np.testing.assert_allclose(z["mel"][0], mel_std[:4], atol=1e-5)
        np.testing.assert_allclose(z["mel"][3], mel_std[3:7], atol=1e-5)


def test_fixedlen_dataset_npz_and_npy(processed):
    ds = FixedLenPairDataset(str(processed), ref_frames=4)
    assert ds.mode == "npz"
    n = len(ds)
    assert n > 20
    item = ds[0]
    assert item["mri"].shape == (4, 1, 256, 256)
    assert item["mel"].shape == (4, 64)
    assert item["mask"].shape == (4,)

    # convert to npy and reload in mmap mode — identical content
    out_npy = processed / "pairs_ref4_npy"
    convert_npz_to_npy(processed / "pairs_ref4", out_npy)
    ds2 = FixedLenPairDataset(str(processed), ref_frames=4)
    assert ds2.mode == "npy"
    assert len(ds2) == n
    for idx in (0, n // 2, n - 1):
        a, b = ds[idx], ds2[idx]
        for k in ("mri", "mel", "mask"):
            np.testing.assert_array_equal(a[k], b[k])


def test_batch_loader(processed):
    ds = FixedLenPairDataset(str(processed), ref_frames=4)
    tr, va, te = split_indices(len(ds), seed=42)
    assert len(tr) + len(va) + len(te) == len(ds)
    assert len(set(tr) & set(va)) == 0

    loader = BatchLoader(ds, tr, batch_size=4, seed=1)
    batches = list(loader)
    assert len(batches) == len(tr) // 4
    b = batches[0]
    assert b["mri"].shape == (4, 4, 1, 256, 256)
    assert b["mel"].shape == (4, 4, 64)

    # deterministic per epoch, reshuffled across epochs
    loader.set_epoch(0)
    b0 = next(iter(loader))
    loader.set_epoch(0)
    b0b = next(iter(loader))
    np.testing.assert_array_equal(b0["mel"], b0b["mel"])
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert not np.array_equal(b0["mel"], b1["mel"])


def test_batch_loader_early_break_stops_worker(processed):
    """Abandoning the iterator (max_train_steps / early-stop / preemption
    breaks) must stop the prefetch worker instead of leaking it blocked on
    the full queue with pinned batches."""
    import threading
    import time as time_mod

    ds = FixedLenPairDataset(str(processed), ref_frames=4)
    tr, _, _ = split_indices(len(ds), seed=42)
    before = threading.active_count()
    for _ in range(3):
        it = iter(BatchLoader(ds, tr, batch_size=2, seed=1, prefetch=1))
        next(it)
        it.close()  # deterministic GeneratorExit (same path as a loop break)
    deadline = time_mod.time() + 10.0
    while threading.active_count() > before and time_mod.time() < deadline:
        time_mod.sleep(0.05)
    assert threading.active_count() <= before


def test_batch_loader_propagates_gather_errors(processed):
    """A gather failure inside the prefetch worker must raise in the
    consumer (as prefetch=0 would), not silently truncate the epoch."""
    ds = FixedLenPairDataset(str(processed), ref_frames=4)
    tr, _, _ = split_indices(len(ds), seed=42)
    orig = ds.gather_batch
    calls = [0]

    def boom(idx):
        calls[0] += 1
        if calls[0] == 3:
            raise RuntimeError("injected gather failure")
        return orig(idx)

    ds.gather_batch = boom
    with pytest.raises(RuntimeError, match="injected gather failure"):
        list(BatchLoader(ds, tr, batch_size=2, seed=1, prefetch=2))


def test_npy_index_rejects_truncated_mel(tmp_path):
    """npy-mode trusts index-time shapes in its fast gather (native memcpy,
    no bounds check): a mel/mask store with fewer rows than mri must be
    caught at index time, not read out of bounds at training time."""
    store = tmp_path / "pairs_ref4_npy" / "aaa"
    store.mkdir(parents=True)
    np.save(store / "mri.npy", np.zeros((3, 4, 1, 8, 8), np.float32))
    np.save(store / "mel.npy", np.zeros((2, 4, 64), np.float32))  # truncated
    np.save(store / "mask.npy", np.ones((3, 4), np.float32))
    with pytest.raises(ValueError, match="mel.npy has 2 rows"):
        FixedLenPairDataset(str(tmp_path), ref_frames=4, allow_broken_skip=False)
    # default skip-broken mode: the folder is skipped (empty store raises)
    with pytest.raises(RuntimeError, match="No pairs available"):
        FixedLenPairDataset(str(tmp_path), ref_frames=4)


def test_natural_key_sorting():
    names = ["s10", "s2", "s1"]
    assert sorted(names, key=natural_key) == ["s1", "s2", "s10"]


def test_filelists_and_meldataset(tmp_path):
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    for i in range(12):
        _write_wav(wavs / f"utt{i:03d}.wav", 1.0, freq=200 + 10 * i)
    create_filelists(wavs, tmp_path / "lists", valid_ratio=0.1, seed=42)
    train_txt = (tmp_path / "lists" / "training.txt").read_text().strip().splitlines()
    valid_txt = (tmp_path / "lists" / "validation.txt").read_text().strip().splitlines()
    assert len(train_txt) == 11 and len(valid_txt) == 1
    assert all("|dummy|dummy" in l for l in train_txt)

    class A:
        input_wavs_dir = str(wavs)
        input_training_file = str(tmp_path / "lists" / "training.txt")
        input_validation_file = str(tmp_path / "lists" / "validation.txt")

    train_files, valid_files = get_dataset_filelist(A())
    assert len(train_files) == 11

    ds = MelDataset(
        train_files, segment_size=8400, n_fft=2048, num_mels=64, hop_size=420,
        win_size=2048, sampling_rate=SR, fmin=0, fmax=8000.0,
    )
    item = ds[0]
    assert item["audio"].shape == (8400,)
    assert item["mel"] is None
    assert np.max(np.abs(item["audio"])) <= 0.95 + 1e-6

    batch = ds.gather_batch([0, 1, 2])
    assert batch["audio"].shape == (3, 8400)


def test_meldataset_finetuning_weighted_dirs(tmp_path):
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    _write_wav(wavs / "utt000.wav", 1.0)
    # two mel dirs with distinguishable contents
    d1, d2 = tmp_path / "mels_gt", tmp_path / "mels_pred"
    for d, fill in ((d1, 1.0), (d2, 2.0)):
        d.mkdir()
        np.save(d / "utt000.npy", np.full((64, 27), fill, dtype=np.float32))

    ds = MelDataset(
        [str(wavs / "utt000.wav")], segment_size=8400, n_fft=2048, num_mels=64,
        hop_size=420, win_size=2048, sampling_rate=SR, fmin=0, fmax=8000.0,
        fine_tuning=True, mel_dirs=[str(d1), str(d2)], mel_weights=[0.5, 0.5],
        shuffle=False,
    )
    seen = set()
    for _ in range(20):
        item = ds[0]
        assert item["mel"].shape == (64, 20)  # frames_per_seg = ceil(8400/420)
        assert item["audio"].shape == (8400,)
        seen.add(float(item["mel"][0, 0]))
    assert seen == {1.0, 2.0}  # both dirs sampled

    # weight 0 dir is filtered out
    ds2 = MelDataset(
        [str(wavs / "utt000.wav")], segment_size=8400, n_fft=2048, num_mels=64,
        hop_size=420, win_size=2048, sampling_rate=SR, fmin=0, fmax=8000.0,
        fine_tuning=True, mel_dirs=[str(d1), str(d2)], mel_weights=[1.0, 0.0],
        shuffle=False,
    )
    assert ds2.mel_dirs == [str(d1)]


def test_repack_pairs(tmp_path):
    d = tmp_path / "pairs"
    d.mkdir()
    for name in ("001_a.npz", "001_b.npz", "002_a.npz", "misc.npz"):
        np.savez(d / name, x=np.zeros(1))
    moved = repack_pairs_by_video(str(d))
    assert moved == 3
    assert (d / "001" / "001_a.npz").exists()
    assert (d / "002" / "002_a.npz").exists()
    assert (d / "misc.npz").exists()  # non-3-digit prefix skipped


def test_compute_mel_db_host_matches_direct(rng):
    y = (rng.standard_normal(SR).astype(np.float32) * 0.3).clip(-1, 1)
    import jax.numpy as jnp

    from mri2speech_tpu.ops.mel import compute_mel_db

    direct = np.asarray(compute_mel_db(jnp.asarray(y), SR, method="fft"))
    hosted = compute_mel_db_host(y, SR)
    assert hosted.shape == direct.shape
    np.testing.assert_allclose(hosted, direct, atol=1e-3)


def test_mel_db_host_top_db_floor_ignores_pad_frames(rng):
    """The top_db=80 floor is max-relative; a loud burst in the trailing
    samples NO true frame covers (the (L-n_fft) % hop leftover) lands in a
    boundary PAD frame only. The device must therefore compute without the
    floor and apply it host-side over true frames — otherwise every quiet
    frame is irreversibly clipped up to pad_max-80 instead of true_max-80."""
    import jax.numpy as jnp

    from mri2speech_tpu.ops.mel import compute_mel_db

    n_fft = 2048
    L = n_fft + 10 * HOP + 400  # leftover 400 samples beyond the last frame
    y = (1e-4 * rng.standard_normal(L)).astype(np.float32)
    y[-400:] = 0.9  # burst seen ONLY by padded boundary frames

    direct = np.asarray(compute_mel_db(jnp.asarray(y), SR, method="fft"))
    hosted = compute_mel_db_host(y, SR)
    assert hosted.shape == direct.shape == (11, 64)
    np.testing.assert_allclose(hosted, direct, atol=1e-3)
    # the quiet frames span well over 80 dB less than the burst, so the old
    # padded-max floor would have flattened them; sanity-check real dynamics
    assert hosted.max() - hosted.min() <= 80.0 + 1e-3


def test_native_gather_matches_numpy(tmp_path):
    from mri2speech_tpu.runtime import native

    src = np.arange(5 * 3 * 4, dtype=np.float32).reshape(5, 3, 4)
    np.save(tmp_path / "src.npy", src)
    mm = np.load(tmp_path / "src.npy", mmap_mode="r")
    idx = np.array([4, 0, 2], dtype=np.int64)
    out = native.gather_rows(mm, idx)
    np.testing.assert_array_equal(out, src[idx])
    native.prefetch_rows(mm, idx)  # no-op or madvise; must not crash
    # int64 indices of any dtype input
    out2 = native.gather_rows(np.asarray(mm), [1, 1])
    np.testing.assert_array_equal(out2, src[[1, 1]])
