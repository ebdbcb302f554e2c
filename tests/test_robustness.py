"""Failure-handling tests: broken files skipped, checkpoint loader guards."""
import json
from pathlib import Path

import numpy as np
import pytest

from mri2speech_tpu.data.dataset import FixedLenPairDataset


def _make_pairs_dir(root: Path, stems, ref_frames=4, hw=16):
    pairs = root / f"pairs_ref{ref_frames}"
    pairs.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for stem, n in stems:
        np.savez_compressed(
            pairs / f"{stem}.npz",
            mri=rng.random((n, ref_frames, 1, hw, hw)).astype(np.float32),
            mel=rng.random((n, ref_frames, 64)).astype(np.float32),
            mask=np.ones((n, ref_frames), dtype=np.float32),
        )
    return pairs


def test_corrupt_npz_skipped_at_index_time(tmp_path):
    pairs = _make_pairs_dir(tmp_path, [("good1", 3), ("good2", 2)])
    (pairs / "broken.npz").write_bytes(b"not a zip archive")

    ds = FixedLenPairDataset(str(tmp_path), ref_frames=4, expected_hw=(16, 16))
    assert len(ds) == 5  # broken file indexed out, not fatal
    item = ds[4]
    assert item["mri"].shape == (4, 1, 16, 16)

    # strict mode raises instead
    # (force_reindex so the cached index from the first pass is not reused)
    with pytest.raises(Exception):
        FixedLenPairDataset(
            str(tmp_path), ref_frames=4, expected_hw=(16, 16),
            allow_broken_skip=False, force_reindex=True,
        )


def test_wrong_T_skipped(tmp_path):
    pairs = _make_pairs_dir(tmp_path, [("ok", 3)])
    rng = np.random.default_rng(1)
    np.savez_compressed(
        pairs / "badT.npz",
        mri=rng.random((2, 7, 1, 16, 16)).astype(np.float32),  # T=7 != 4
        mel=rng.random((2, 7, 64)).astype(np.float32),
        mask=np.ones((2, 7), dtype=np.float32),
    )
    ds = FixedLenPairDataset(
        str(tmp_path), ref_frames=4, expected_hw=(16, 16), force_reindex=True
    )
    assert len(ds) == 3  # only the well-shaped file


def test_index_cache_reused_and_invalidatable(tmp_path):
    _make_pairs_dir(tmp_path, [("a", 2), ("b", 2)])
    ds1 = FixedLenPairDataset(str(tmp_path), ref_frames=4, expected_hw=(16, 16))
    cache = tmp_path / "pairs_ref4" / "index_ref4.txt"
    assert cache.is_file()
    # add a file: cached index hides it until force_reindex
    rng = np.random.default_rng(2)
    np.savez_compressed(
        tmp_path / "pairs_ref4" / "c.npz",
        mri=rng.random((2, 4, 1, 16, 16)).astype(np.float32),
        mel=rng.random((2, 4, 64)).astype(np.float32),
        mask=np.ones((2, 4), dtype=np.float32),
    )
    ds2 = FixedLenPairDataset(str(tmp_path), ref_frames=4, expected_hw=(16, 16))
    assert len(ds2) == len(ds1)
    ds3 = FixedLenPairDataset(
        str(tmp_path), ref_frames=4, expected_hw=(16, 16), force_reindex=True
    )
    assert len(ds3) == len(ds1) + 2


def test_checkpoint_loader_guards(tmp_path):
    from mri2speech_tpu.train import checkpoint as ckpt_io

    with pytest.raises(FileNotFoundError):
        ckpt_io.load_checkpoint_raw(str(tmp_path / "missing"))
    assert ckpt_io.scan_checkpoint(str(tmp_path), "g_") is None

    # scan picks the lexicographically-latest 8-digit checkpoint
    for step in (17, 9001, 420):
        ckpt_io.save_checkpoint(str(tmp_path / f"g_{step:08d}"), {"x": np.zeros(1)})
    assert ckpt_io.scan_checkpoint(str(tmp_path), "g_").endswith("g_00009001")


def test_enable_persistent_compilation_cache_sets_backend_dir():
    import jax

    from mri2speech_tpu.utils.profiling import enable_persistent_compilation_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        path = enable_persistent_compilation_cache(min_compile_time_secs=0.7)
        assert path.endswith(f"jax_comp_cache_{jax.default_backend()}")
        assert jax.config.jax_compilation_cache_dir == path
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.7
    finally:
        # restore the suite-wide cache dir set by conftest — the suite's
        # warm-rerun speed depends on it
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_generator_checkpoint_missing_key(tmp_path):
    from mri2speech_tpu.infer.vocoder_io import load_generator
    from mri2speech_tpu.train import checkpoint as ckpt_io

    cfg = tmp_path / "config.json"
    from mri2speech_tpu.config import default_vocoder_config

    cfg.write_text(json.dumps(dict(default_vocoder_config())))
    ckpt_io.save_checkpoint(str(tmp_path / "g_bad"), {"not_generator": {}})
    with pytest.raises(KeyError):
        load_generator(str(cfg), str(tmp_path / "g_bad"))
