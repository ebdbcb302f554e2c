"""Checkpoint IO for both training schemes.

* Acoustic: single best-val checkpoint file with model/optimizer/scheduler
  state + losses, full-resume semantics (`train_mri_acoustic_model.py:393-462,
  508-521`).
* Vocoder: paired step-numbered files `g_XXXXXXXX` (generator) and
  `do_XXXXXXXX` (discriminators + optimizers + steps + epoch), auto-resumed by
  directory scan (`train.py:42-57,200-211`, `utils.py:52-57`).

Serialisation is flax msgpack (single file, atomic rename) — the functional
analogue of `torch.save`. Arrays restore onto the default device; shard-aware
orbax restore is available through `save_pytree_orbax`/`restore_pytree_orbax`
for multi-host runs.
"""
from __future__ import annotations

import glob
import os
from typing import Any, Optional

from flax import serialization


def save_checkpoint(filepath: str, obj: Any) -> None:
    """Atomic msgpack save of an arbitrary pytree."""
    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    data = serialization.to_bytes(obj)
    tmp = filepath + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, filepath)


def load_checkpoint(filepath: str, template: Any) -> Any:
    """Restore a pytree with `template`'s structure from msgpack bytes."""
    if not os.path.isfile(filepath):
        raise FileNotFoundError(filepath)
    with open(filepath, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def load_checkpoint_raw(filepath: str) -> Any:
    """Structure-free restore (nested dicts / numpy arrays)."""
    if not os.path.isfile(filepath):
        raise FileNotFoundError(filepath)
    with open(filepath, "rb") as f:
        return serialization.msgpack_restore(f.read())


def scan_checkpoint(cp_dir: str, prefix: str) -> Optional[str]:
    """Latest `prefix????????` checkpoint by lexicographic order (`utils.py:52-57`)."""
    pattern = os.path.join(cp_dir, prefix + "????????")
    cp_list = glob.glob(pattern)
    if len(cp_list) == 0:
        return None
    return sorted(cp_list)[-1]


def save_pytree_orbax(path: str, tree: Any) -> None:
    """Orbax StandardCheckpointer save (sharding-aware; for multi-host runs)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_pytree_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
