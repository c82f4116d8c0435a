"""HyperLogLog approx-distinct: accuracy vs exact, merge associativity."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from obsidian_parser_ray.stages.sketch import HllSketch, _hash64_bytes, approx_distinct


def test_accuracy_within_bound(ray_session):
    n = 20000
    ds = rd.from_arrow(
        pa.table({"v": pa.array([f"user_{i % 5000}" for i in range(n)], pa.string())})
    )
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - 5000) / 5000 < 0.05  # 3x the 1.6% std error


def test_merge_equals_single_pass():
    vals = [f"x{i}" for i in range(3000)]
    whole = HllSketch(10)
    whole.add_hashes(_hash64_bytes(vals))
    a, b = HllSketch(10), HllSketch(10)
    a.add_hashes(_hash64_bytes(vals[:1500]))
    b.add_hashes(_hash64_bytes(vals[1500:]))
    assert np.array_equal(a.merge(b).registers, whole.registers)


def test_small_range_linear_counting():
    sk = HllSketch(12)
    sk.add_hashes(_hash64_bytes([f"v{i}" for i in range(10)]))
    assert abs(sk.estimate() - 10) < 1.0


def test_int_column(ray_session):
    ds = rd.range(10000).map_batches(
        lambda t: pa.table({"u": pa.array([int(x) % 777 for x in t["id"].to_pylist()], pa.int64())}),
        batch_format="pyarrow",
    )
    est = approx_distinct(ds, "u", p=12)
    assert abs(est - 777) / 777 < 0.05
