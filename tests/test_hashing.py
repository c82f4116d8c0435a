"""The shared partition hash is a CONTRACT: scalar and array paths
must agree bit-for-bit (persisted layouts depend on it)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from obsidian_parser_ray.hashing import hash_bucket_array, hash_bucket_scalar


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=20),
       st.integers(min_value=1, max_value=1024))
def test_scalar_matches_array_strings(values, n):
    arr = hash_bucket_array(pa.array(values, pa.string()), n).to_pylist()
    assert arr == [hash_bucket_scalar(v, n) for v in values]


def test_chunked_input_and_numpy_input_agree():
    vals = [f"k{i}" for i in range(100)]
    a1 = hash_bucket_array(pa.array(vals), 64).to_pylist()
    chunked = pa.chunked_array([pa.array(vals[:50]), pa.array(vals[50:])])
    a2 = hash_bucket_array(chunked, 64).to_pylist()
    a3 = hash_bucket_array(np.asarray(vals, dtype=object), 64).to_pylist()
    assert a1 == a2 == a3


def test_int_keys_deterministic():
    vals = pa.array(list(range(1000)), pa.int64())
    a = hash_bucket_array(vals, 64).to_pylist()
    b = hash_bucket_array(vals, 64).to_pylist()
    assert a == b
    # reasonable spread
    assert len(set(a)) > 40
