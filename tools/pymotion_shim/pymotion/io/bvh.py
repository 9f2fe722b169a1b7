"""BVH IO (pymotion-compatible subset), backed by dragposer_tpu.io.bvh."""

from __future__ import annotations

import numpy as np

from dragposer_tpu.io.bvh import BVH as _BVH
from pymotion.rotations import quat


class BVH:
    def __init__(self):
        self._b = _BVH()
        self.data = None

    def load(self, path):
        self._b.load(path)
        self.data = {
            "rotations": self._b.rotations,
            "positions": self._b.positions,
            "parents": self._b.parents.copy(),
            "offsets": self._b.offsets.copy(),
            "rot_order": self._b.rot_order,
            "names": list(self._b.names),
            "frame_time": self._b.frame_time,
        }
        return self

    def get_data(self):
        """(local quats, positions, parents, offsets, end_sites, names)."""
        order = np.tile(
            self.data["rot_order"], (self.data["rotations"].shape[0], 1, 1)
        )
        rots = quat.unroll(
            quat.from_euler(np.radians(self.data["rotations"]), order=order),
            axis=0,
        )
        rots = quat.normalize(rots)
        return (rots, self.data["positions"], self.data["parents"],
                self.data["offsets"], self._b.end_sites, self.data["names"])

    def save(self, path):
        self._b.rotations = np.asarray(self.data["rotations"])
        self._b.positions = np.asarray(self.data["positions"])
        self._b.save(path)
