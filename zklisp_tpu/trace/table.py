"""Column-major trace table of field elements (host representation).

Values are canonical Python ints in [0, p).  Column-major storage matches
the access pattern of both the builders (per-column fills) and the device
boundary (per-column limb conversion for LDE).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..field import limb


class TraceTable:
    __slots__ = ("width", "length", "cols")

    def __init__(self, width: int, length: int) -> None:
        self.width = width
        self.length = length
        self.cols: List[List[int]] = [[0] * length for _ in range(width)]

    def get(self, col: int, row: int) -> int:
        return self.cols[col][row]

    def set(self, col: int, row: int, v: int) -> None:
        self.cols[col][row] = v

    def col(self, col: int) -> List[int]:
        return self.cols[col]

    def row(self, row: int) -> List[int]:
        return [c[row] for c in self.cols]

    def to_limbs(self, xp=np):
        """(width, length, 8) limb array for device consumption."""
        return limb.from_ints([self.cols[c] for c in range(self.width)], xp)

    def slice_rows(self, r_start: int, r_end: int,
                   col_map: List[int] | None = None) -> "TraceTable":
        """Row slice; `col_map[seg_col] = full_col` optionally remaps
        columns (segment layouts)."""
        if col_map is None:
            col_map = list(range(self.width))
        out = TraceTable(len(col_map), r_end - r_start)
        for seg_c, full_c in enumerate(col_map):
            out.cols[seg_c] = self.cols[full_c][r_start:r_end]
        return out
