"""64-bit index mode of the doubling engine.

The reference gates a 64-bit build behind BUILD_DIVSUFSORT64
(ref: c-sources/divsufsort_private.h:63-84); here the index width is a
parameter of the jittable build. Texts past 2^31 can't be exercised in CI,
so these tests pin the *semantics*: identical SAs to the int32 path and
int64 output dtype end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stringsearch_tpu.engines.doubling import build_with_isa
from stringsearch_tpu.harness.corpus import enwik_like, regression_corpus

from tests.conftest import naive_suffix_array


def test_i64_matches_i32():
    with jax.enable_x64():
        for data in [enwik_like(2000, seed=11), regression_corpus()["period2"]]:
            arr = jnp.asarray(np.frombuffer(data, np.uint8))
            sa64, isa64 = build_with_isa(arr, idx=jnp.int64)
            assert sa64.dtype == jnp.int64
            assert isa64.dtype == jnp.int64
            np.testing.assert_array_equal(
                np.asarray(sa64), naive_suffix_array(data)
            )


def test_i32_default_dtype():
    arr = jnp.asarray(np.frombuffer(b"mississippi", np.uint8))
    sa, isa = build_with_isa(arr)
    assert sa.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(sa), naive_suffix_array(b"mississippi"))
