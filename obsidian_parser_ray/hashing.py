"""Deterministic partition hashing shared by every stage that persists
or shuffles on a hash bucket.

One definition on purpose: these bits define on-disk bucket identity
(adjacency layout) AND shuffle co-location (canonicalize, shuffle-join
linking), so all sites must agree forever.  ``pd.util.hash_array`` is a
fixed-key siphash — deterministic across processes and machines (the
same property dask relies on for shuffle partitioning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_bucket_array(values, num_buckets: int) -> pa.Array:
    """Vectorized bucket ids for an Arrow/numpy array → int32 Arrow array.

    ``categorize=False``: the categorize fast path factorizes through a
    C string table that conflates NUL-containing strings (verified:
    ``''`` and ``'\\x00'`` hash identically with categorize=True) —
    direct hashing is the bit-exact definition.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(values), categorize=False)
    return pa.array((h % num_buckets).astype("int32"), pa.int32())


def hash_bucket_scalar(value, num_buckets: int) -> int:
    """Bucket id of one value — bit-identical to the array path.

    NOTE: int() BEFORE the modulo — a np.uint64 scalar % python int
    promotes to float64 and silently corrupts the bucket id.
    """
    return (
        int(
            pd.util.hash_array(
                np.asarray([value], dtype=object), categorize=False
            )[0]
        )
        % num_buckets
    )
