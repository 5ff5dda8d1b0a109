"""Checkpoint save/resume with the reference's retention policy.

Behavioral reference: /root/reference/codes/models/base_model.py:79-162 — model
weights and trainer state saved per iteration tag, pruned to keep the 2 newest plus
every ``keep_period`` multiple (5000); ``resume_state: auto`` picks the newest state
(util.py:1139-1150, natural sort).

Two storage backends behind one API:

- ``pickle`` (default): a pickle of the numpy-ified pytree — simple, single-host.
- ``orbax``: async tensorstore-backed writes, multi-host sharded jax.Arrays saved
  and restored in place (each checkpoint is a DIRECTORY with the same ``<iter>_G.ckpt``
  / ``<iter>.state`` naming, so listing/retention/auto-resume are backend-agnostic).
  Select per call (``backend='orbax'``) or via config ``path.checkpoint_backend``.

``load_any`` also accepts reference ``.pth`` files, converting them with
utils.convert (torch required only then).
"""

from __future__ import annotations

import os
import pickle
import re
import shutil
from typing import Any, List, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# ------------------------------------------------------------------ orbax backend
_ORBAX_CKPTR = None


def _orbax_checkpointer():
    """Singleton async orbax checkpointer (background tensorstore writes)."""
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp

        _ORBAX_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_CKPTR


def wait_for_saves() -> None:
    """Block until pending async (orbax) checkpoint writes are durable."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()


def save_checkpoint(path: str, tree: Any, backend: str = "pickle") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if backend == "orbax":
        ckptr = _orbax_checkpointer()
        # async: returns immediately, previous write for the same path finished
        # first (orbax serializes); scalars become 0-d arrays for tensorstore
        tree = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, (int, float, bool)) else x, tree
        )
        ckptr.save(os.path.abspath(path), tree, force=True)
        return
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(tree), f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Load a checkpoint. Orbax checkpoints (directories) restore into the structure
    of ``like`` when given (exact NamedTuple/dataclass layout and shardings —
    required for optimizer state); otherwise as nested dicts."""
    wait_for_saves()  # an in-flight async write may not have renamed its dir yet
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = _orbax_checkpointer()
        if like is None:
            return ckptr.restore(os.path.abspath(path))
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(
            os.path.abspath(path), args=ocp.args.StandardRestore(abstract)
        )
    with open(path, "rb") as f:
        return pickle.load(f)


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def list_checkpoints(directory: str, suffix: str = ".ckpt") -> List[str]:
    if not os.path.isdir(directory):
        return []
    files = [f for f in os.listdir(directory) if f.endswith(suffix)]
    return sorted(files, key=_natural_key)


def prune_checkpoints(directory: str, suffix: str = ".ckpt", keep: int = 2,
                      keep_period: int = 5000) -> None:
    """Keep the newest ``keep`` plus every ``keep_period`` multiple (base_model.py:82-94)."""
    wait_for_saves()  # in-flight async writes must finalize before we list/delete
    files = list_checkpoints(directory, suffix)
    if len(files) <= keep:
        return
    for f in files[:-keep]:
        m = re.match(r"(\d+)", f)
        it = int(m.group(1)) if m else -1
        if keep_period and it >= 0 and it % keep_period == 0:
            continue
        full = os.path.join(directory, f)
        if os.path.isdir(full):  # orbax checkpoints are directories
            shutil.rmtree(full)
        else:
            os.remove(full)


def latest_checkpoint(directory: str, suffix: str = ".ckpt") -> Optional[str]:
    files = list_checkpoints(directory, suffix)
    return os.path.join(directory, files[-1]) if files else None


def load_any(path: str, flow_spec=None, prefix: str = "flow", like: Any = None):
    """Load a native .ckpt (pickle or orbax) or a reference .pth (converted)."""
    if path.endswith(".pth"):
        from .convert import load_reference_checkpoint

        assert flow_spec is not None, "converting a .pth requires the FlowNetSpec"
        return load_reference_checkpoint(path, flow_spec, prefix)
    return load_checkpoint(path, like=like)
