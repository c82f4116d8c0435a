"""Approximate aggregates: HyperLogLog distinct-count sketch.

The mergeable-sketch pattern for Ray Data: every block folds its rows
into a tiny register array inside ``map_batches`` (the partial), the
driver merges partials with an elementwise max — a few KB cross the
cluster regardless of row count.  This is the canonical shape for any
sketch (HLL, KMV, count-min, reservoir): partial per block, associative
merge, finalize on the driver.

HLL per Flajolet et al. 2007 with the standard bias correction for
small/large ranges.  Standard error ≈ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash64_array


def _hash64_bytes(values: list) -> np.ndarray:
    """Deterministic 64-bit hashes of arbitrary scalar values
    (the codebase's ONE canonical hash — vectorized siphash)."""
    return hash64_array(values)


class HllSketch:
    """Register array + merge/estimate (driver-side finalization)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = position of the leftmost 1-bit in the remaining 64-p
        # bits, 1-based; all-zero rest → max rank
        nbits = 64 - self.p
        rank = np.full(len(hashes), nbits + 1, dtype=np.uint8)
        found = np.zeros(len(hashes), dtype=bool)
        for r in range(1, nbits + 1):
            bit = (rest >> np.uint64(64 - r)) & np.uint64(1)
            newly = (~found) & (bit == 1)
            rank[newly] = r
            found |= newly
            if found.all():
                break
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert self.p == other.p
        return HllSketch(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.exp2(-self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        if raw <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        elif raw > (1 << 64) / 30.0:
            return -(2.0**64) * np.log1p(-raw / 2.0**64)
        return raw


def approx_distinct(ds, column: str, *, p: int = 12,
                    batch_size: int | None = None) -> float:
    """Approximate COUNT(DISTINCT column).

    Partials fold per BLOCK (``batch_size=None``) — traffic is one
    2^p-byte blob per block, independent of row count.  Error
    ≈ ±1.04/sqrt(2^p) relative (p=12 → ~1.6%).
    """

    def partial(t: pa.Table) -> pa.Table:
        sk = HllSketch(p)
        sk.add_hashes(_hash64_bytes(t[column].to_pylist()))
        return pa.table({"registers": pa.array([sk.registers.tobytes()], pa.binary())})

    merged = HllSketch(p)
    for b in ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    ).iter_batches(batch_format="pyarrow"):
        for blob in b["registers"].to_pylist():
            merged = merged.merge(
                HllSketch(p, np.frombuffer(blob, dtype=np.uint8).copy())
            )
    return float(merged.estimate())
