"""Disk spill for marginalized clouds — bounded host RSS on long runs.

The reference streams per-scan PCDs to disk and frees the RAM copy
(save_pcd + idle frees, voxelslam.cpp:163-174, 1489-1539) so an
hour-long run does not accumulate every cloud in memory.  Equivalent
here: one append-only binary store per run; scan clouds spill once the
loop layer has consumed them (keyframe builder lag window), keyframe
clouds spill once they are old enough that only the mid-term reload /
finish-time HBA can want them — both reload lazily through the
accessors below.

Layout per record: n (int32), then n float16 triples (masked points
only).  Reloads reconstruct the padded (P, 3) + mask layout consumers
expect (row order within a cloud is never semantic)."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


class CloudSpill:
    """Append-only spill file with an in-memory offset index."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "wb+")
        self._index: List[Tuple[int, int, int]] = []  # (offset, n, P)

    def put(self, pts: np.ndarray, mask: np.ndarray) -> int:
        """Store one padded cloud; returns the record id."""
        P = int(pts.shape[0])
        sel = np.asarray(pts[mask], np.float16)
        off = self._f.seek(0, 2)
        self._f.write(np.int32(len(sel)).tobytes())
        self._f.write(sel.tobytes())
        self._index.append((off, len(sel), P))
        return len(self._index) - 1

    def get(self, rid: int) -> Tuple[np.ndarray, np.ndarray]:
        """Reload record `rid` as padded (P, 3) f32 + (P,) mask."""
        off, n, P = self._index[rid]
        self._f.seek(off + 4)
        raw = self._f.read(n * 3 * 2)
        sel = np.frombuffer(raw, np.float16).reshape(n, 3)
        pts = np.zeros((P, 3), np.float32)
        msk = np.zeros(P, bool)
        pts[:n] = sel
        msk[:n] = True
        return pts, msk

    def close(self):
        try:
            self._f.close()
        except OSError:
            pass


def spill_scan(store: Optional[CloudSpill], sp: dict) -> bool:
    """Move one scan-pose dict's cloud to the store (idempotent)."""
    if store is None or sp.get("pts") is None:
        return False
    sp["spill"] = (store, store.put(sp["pts"], sp["mask"]))
    sp["pts"] = None
    sp["mask"] = None
    return True


def fetch_scan(sp: dict) -> Tuple[np.ndarray, np.ndarray]:
    """(pts, mask) of a scan-pose dict, materializing from spill."""
    if sp.get("pts") is not None:
        return sp["pts"], sp["mask"]
    ref = sp.get("spill")
    if ref is None:
        raise KeyError("scan pose has neither cloud nor spill record")
    store, rid = ref
    return store.get(rid)
