"""Shape bucketing.

Replaces TensorRT dynamic shapes + optimization profiles
(builder.py:58-71: min/opt/max = batch 1/4/6 x len 1/500/6100). XLA
compiles static shapes, so variable-length inputs are padded up to the
nearest bucket; each bucket compiles once and is cached (in-process and
in the persistent compilation cache).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

# Default ladder covers the reference profile (1..6100 frames, batch 1..6)
DEFAULT_LENGTHS = (256, 512, 1024, 2048, 4096, 6144)
DEFAULT_BATCHES = (1, 2, 4, 8)


@dataclass(frozen=True)
class BucketSpec:
    lengths: Tuple[int, ...] = DEFAULT_LENGTHS
    batches: Tuple[int, ...] = DEFAULT_BATCHES

    def pick(self, batch: int, length: int) -> Tuple[int, int]:
        """Smallest bucket covering (batch, length); the top bucket
        clamps nothing — longer inputs raise (the reference engine
        likewise rejects shapes beyond its max profile)."""
        b = next((x for x in self.batches if x >= batch), None)
        t = next((x for x in self.lengths if x >= length), None)
        if b is None:
            raise ValueError(
                f"batch {batch} exceeds max bucket {self.batches[-1]}")
        if t is None:
            raise ValueError(
                f"length {length} exceeds max bucket {self.lengths[-1]}")
        return b, t

    def all_buckets(self) -> List[Tuple[int, int]]:
        return [(b, t) for b in self.batches for t in self.lengths]
