"""Checkpoint save/load for model parameters, optimizer state, and embeddings.

Parity with the reference Checkpointer (storage/checkpointer.cpp:12-116):
`save` writes dense params + optimizer state + embedding table + Adagrad state
+ a small metadata file; `create_checkpoint` snapshots into checkpoint_<n>/
via tmp-dir + atomic rename; `load` restores everything for resume. The
reference writes torch archives + raw binaries; here each pytree leaf is a raw
.npy inside the checkpoint dir (flat, inspectable, mmap-able), with the tree
structure in meta.yaml.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import yaml


def _is_prng_key(leaf) -> bool:
    return hasattr(leaf, "dtype") and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)


def _path_entry(p) -> str:
    if hasattr(p, "name"):      # GetAttrKey (dataclass fields)
        return str(p.name)
    if hasattr(p, "key"):       # DictKey
        return str(p.key)
    if hasattr(p, "idx"):       # SequenceKey
        return str(p.idx)
    return str(p)


def _path_key(path) -> str:
    key = "/".join(_path_entry(p) for p in path) or "value"
    return key.replace("[", "").replace("]", "").replace("'", "")


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        if _is_prng_key(leaf):
            leaf = jax.random.key_data(leaf)
        out[_path_key(path)] = np.asarray(leaf)
    return out


# leaf-path prefixes that hold optimizer rather than model state — dropped
# from interval checkpoints when training.checkpoint.save_state is false
# (checkpointer.cpp:30 skips the embeddings-state file the same way)
OPTIM_STATE_PREFIXES = ("opt_state", "table/state")


def save_state(directory: str, state, metadata: Optional[Dict[str, Any]] = None,
               exclude_prefixes: Tuple[str, ...] = ()) -> None:
    """Write a TrainState (or any pytree) to `directory` atomically."""
    parent = os.path.dirname(os.path.abspath(directory)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".ckpt_tmp_")
    try:
        leaves = _flatten_with_paths(state)
        if exclude_prefixes:
            leaves = {n: a for n, a in leaves.items()
                      if not n.startswith(exclude_prefixes)}
        for name, arr in leaves.items():
            np.save(os.path.join(tmp, name.replace("/", "__") + ".npy"), arr)
        meta = dict(metadata or {})
        meta["leaf_names"] = sorted(leaves.keys())
        with open(os.path.join(tmp, "meta.yaml"), "w") as f:
            yaml.safe_dump(meta, f)
        if not os.path.exists(directory):
            os.rename(tmp, directory)
        else:
            # overwrite in place: the dir may hold checkpoint_<n>/ subdirs and
            # logs that must survive a final save (checkpointer.cpp keeps
            # checkpoints as siblings of model.pt)
            stale = set()
            old_meta = os.path.join(directory, "meta.yaml")
            if os.path.exists(old_meta):
                with open(old_meta) as f:
                    stale = {n.replace("/", "__") + ".npy"
                             for n in (yaml.safe_load(f) or {}).get("leaf_names", [])}
            for name in os.listdir(tmp):
                os.replace(os.path.join(tmp, name), os.path.join(directory, name))
                stale.discard(name)
            for name in stale:
                path = os.path.join(directory, name)
                if os.path.exists(path):
                    os.remove(path)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def load_state(directory: str, template) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree saved by save_state into the structure of `template`."""
    with open(os.path.join(directory, "meta.yaml")) as f:
        meta = yaml.safe_load(f)
    leaves = _flatten_with_paths(template)
    restored = {}
    missing = []
    for name in leaves:
        path = os.path.join(directory, name.replace("/", "__") + ".npy")
        if os.path.exists(path):
            restored[name] = np.load(path)
        elif name.startswith(OPTIM_STATE_PREFIXES):
            # checkpoint saved with save_state=false: optimizer leaves keep
            # the template's (fresh-init) values; meta reports them
            missing.append(name)
        else:
            # a missing MODEL leaf is a corrupt/mismatched checkpoint, not a
            # save_state=false artifact — evaluating fresh-init params would
            # silently report garbage
            raise FileNotFoundError(
                f"checkpoint {directory} is missing model leaf '{name}' "
                f"({path}); the checkpoint does not match the configured "
                "model")
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in flat:
        arr = restored.get(_path_key(p))
        if arr is None:
            new_leaves.append(leaf)
        elif _is_prng_key(leaf):
            new_leaves.append(jax.random.wrap_key_data(arr))
        else:
            new_leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(np.asarray(leaf).shape))
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if missing:
        meta = dict(meta)
        meta["missing_leaves"] = missing
    return state, meta


def create_checkpoint(model_dir: str, state, epoch: int,
                      metadata: Optional[Dict[str, Any]] = None,
                      save_optim_state: bool = True) -> str:
    """Interval checkpoint: <model_dir>/checkpoint_<epoch>/ (checkpointer.cpp:18-37).

    With ``save_optim_state=False`` the optimizer/Adagrad leaves are omitted
    (CheckpointConfig.save_state gating, checkpointer.cpp:30) — the snapshot
    is evaluable but resumes with fresh optimizer state."""
    meta = dict(metadata or {})
    meta["epochs_processed"] = int(epoch)
    target = os.path.join(model_dir, f"checkpoint_{epoch}")
    save_state(target, state, meta,
               exclude_prefixes=() if save_optim_state else OPTIM_STATE_PREFIXES)
    return target
