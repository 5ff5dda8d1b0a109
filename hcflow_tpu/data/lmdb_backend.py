"""LMDB-backed image reading (gated on the optional ``lmdb`` package).

Behavioral reference: /root/reference/codes/data/util.py:30-69 (paths from LMDB
meta_info.pkl, _read_img_lmdb).  The reference's recommended fast path is the pklv4
pipeline; LMDB support is kept for dataset-format parity.  The ``lmdb`` package is not
bundled in this environment, so everything here raises a clear error if it is missing.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Tuple

import numpy as np


def _require_lmdb():
    try:
        import lmdb  # noqa: F401

        return lmdb
    except ImportError as e:
        raise ImportError(
            "LMDB datasets require the 'lmdb' package, which is not installed in this "
            "environment. Use mode=LRHR_PKL (pklv4) or image-folder datasets instead."
        ) from e


def paths_from_lmdb(dataroot: str) -> Tuple[List[str], List[str]]:
    """Returns (keys, resolutions 'C_H_W') from the meta_info.pkl beside the LMDB."""
    meta = os.path.join(dataroot, "meta_info.pkl")
    with open(meta, "rb") as f:
        info = pickle.load(f)
    return info["keys"], info.get("resolution")


class LmdbReader:
    def __init__(self, dataroot: str):
        lmdb = _require_lmdb()
        self.env = lmdb.open(
            dataroot, readonly=True, lock=False, readahead=False, meminit=False
        )

    def read(self, key: str, resolution: str) -> np.ndarray:
        """HWC uint8 image decoded from the flat buffer at `key` ('C_H_W' resolution)."""
        with self.env.begin(write=False) as txn:
            buf = txn.get(key.encode("ascii"))
        c, h, w = (int(s) for s in resolution.split("_"))
        img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
        return img
