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


# ---------------------------------------------------------------------------
# multi-host train-state checkpoints (orbax directory + host-0 JSON sidecar)
# ---------------------------------------------------------------------------

_META_NAME = "train_meta.json"


def is_orbax_checkpoint(path: str) -> bool:
    """True if `path` is an orbax train-state directory (vs a msgpack file)."""
    return os.path.isdir(path) and (
        os.path.isfile(os.path.join(path, _META_NAME))
        or os.path.isdir(os.path.join(path, "arrays"))
    )


def save_train_state_orbax(path: str, arrays: Any, meta: dict) -> None:
    """Sharded save for multi-host runs.

    EVERY process must call this (orbax coordinates; each host writes its own
    array shards — this is why the msgpack host-0 gating must NOT be applied
    to this path). The non-array metadata (epoch, scheduler state, losses) is
    written by host 0 only, as a JSON sidecar.
    """
    import json

    import jax

    path = os.path.abspath(path)
    save_pytree_orbax(os.path.join(path, "arrays"), arrays)
    if jax.process_index() == 0:
        tmp = os.path.join(path, _META_NAME + ".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, _META_NAME))


def restore_train_state_orbax(path: str, template_arrays: Any):
    """(arrays, meta) restore; arrays land with the TEMPLATE's shardings.

    Passing the current (possibly differently-meshed) state as the template
    makes restore-onto-a-different-mesh work: orbax reshards on load.
    """
    import json

    path = os.path.abspath(path)
    arrays = restore_pytree_orbax(os.path.join(path, "arrays"), template_arrays)
    meta_path = os.path.join(path, _META_NAME)
    meta = {}
    if os.path.isfile(meta_path):
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)
    return arrays, meta
