"""Disk spill for marginalized clouds — bounded host RSS on long runs.

The reference streams per-scan PCDs to disk and frees the RAM copy
(save_pcd + idle frees, voxelslam.cpp:163-174, 1489-1539) so an
hour-long run does not accumulate every cloud in memory.  Equivalent
here: one append-only binary store per run; scan clouds spill once the
loop layer has consumed them (keyframe builder lag window), keyframe
clouds spill once they are old enough that only the mid-term reload /
finish-time HBA can want them — both reload lazily through the
accessors below.

Storage modes (per store):

- ``i16`` (default): adaptive-scale int16 — per record, scale =
  max(|p|)/32000, so quantization error is ≤ max(|p|)/64000 (≤ 1 mm
  for 64 m-range clouds).  Same 2 B/point as f16 with uniformly
  better precision beyond ~2 m range: f16 ulp is 1.6 cm at 16-32 m
  and 3.1 cm at 32-64 m, visible against plane fits chasing
  millimeter-scale λ0 (the reference spills full-precision PCDs,
  voxelslam.cpp:163-174).  Round-5 A/B on the 60 m stress corpus:
  see CLAUDE.md (f16 vs i16 vs f32 ATE-after-GBA).
- ``f16``: round-4 behavior (range-dependent error, cheap).
- ``f32``: lossless, 2× the bytes.

Layout per record: n (int32), scale (float32; 0 for f16/f32 modes),
then n point triples in the store dtype (masked points only).
Reloads reconstruct the padded (P, 3) + mask layout consumers expect
(row order within a cloud is never semantic)."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

# default chosen by measurement (round-5 stress-corpus A/B); override
# per store or via VOXELSLAM_SPILL_MODE for experiments
DEFAULT_MODE = os.environ.get("VOXELSLAM_SPILL_MODE", "i16")


class CloudSpill:
    """Append-only spill file with an in-memory offset index."""

    def __init__(self, path: str, mode: str = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "wb+")
        self.mode = mode or DEFAULT_MODE
        if self.mode not in ("i16", "f16", "f32"):
            raise ValueError(f"unknown spill mode {self.mode!r}")
        self._itemsize = {"i16": 2, "f16": 2, "f32": 4}[self.mode]
        self._index: List[Tuple[int, int, int]] = []  # (offset, n, P)

    def put(self, pts: np.ndarray, mask: np.ndarray) -> int:
        """Store one padded cloud; returns the record id."""
        P = int(pts.shape[0])
        sel = np.asarray(pts[mask], np.float32)
        scale = np.float32(0.0)
        if self.mode == "i16":
            amax = float(np.max(np.abs(sel))) if len(sel) else 0.0
            scale = np.float32(max(amax / 32000.0, 1e-6))
            payload = np.clip(
                np.round(sel / scale), -32767, 32767
            ).astype(np.int16)
        elif self.mode == "f16":
            payload = sel.astype(np.float16)
        else:
            payload = sel
        off = self._f.seek(0, 2)
        self._f.write(np.int32(len(sel)).tobytes())
        self._f.write(scale.tobytes())
        self._f.write(payload.tobytes())
        self._index.append((off, len(sel), P))
        return len(self._index) - 1

    def get(self, rid: int) -> Tuple[np.ndarray, np.ndarray]:
        """Reload record `rid` as padded (P, 3) f32 + (P,) mask."""
        off, n, P = self._index[rid]
        self._f.seek(off + 4)
        scale = np.frombuffer(self._f.read(4), np.float32)[0]
        raw = self._f.read(n * 3 * self._itemsize)
        if self.mode == "i16":
            sel = np.frombuffer(raw, np.int16).reshape(n, 3) * scale
        elif self.mode == "f16":
            sel = np.frombuffer(raw, np.float16).reshape(n, 3)
        else:
            sel = np.frombuffer(raw, np.float32).reshape(n, 3)
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
