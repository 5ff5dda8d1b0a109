"""Checkpoint save/resume with the reference's retention policy.

Behavioral reference: /root/reference/codes/models/base_model.py:79-162 — model
weights and trainer state saved per iteration tag, pruned to keep the 2 newest plus
every ``keep_period`` multiple (5000); ``resume_state: auto`` picks the newest state
(util.py:1139-1150, natural sort).

Format: a pickle of the numpy-ified pytree (params / optimizer state are nested
dicts/lists/optax NamedTuples — all picklable).  ``load_any`` also accepts reference
``.pth`` files, converting them with utils.convert (torch required only then).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, List, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(tree), f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
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
    files = list_checkpoints(directory, suffix)
    if len(files) <= keep:
        return
    for f in files[:-keep]:
        m = re.match(r"(\d+)", f)
        it = int(m.group(1)) if m else -1
        if keep_period and it >= 0 and it % keep_period == 0:
            continue
        os.remove(os.path.join(directory, f))


def latest_checkpoint(directory: str, suffix: str = ".ckpt") -> Optional[str]:
    files = list_checkpoints(directory, suffix)
    return os.path.join(directory, files[-1]) if files else None


def load_any(path: str, flow_spec=None, prefix: str = "flow"):
    """Load a native .ckpt or a reference .pth (converted via the flow spec)."""
    if path.endswith(".pth"):
        from .convert import load_reference_checkpoint

        assert flow_spec is not None, "converting a .pth requires the FlowNetSpec"
        return load_reference_checkpoint(path, flow_spec, prefix)
    return load_checkpoint(path)
