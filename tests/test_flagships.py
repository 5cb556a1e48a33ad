"""Every registry flagship compiles and runs end-to-end (small shapes)."""

import jax
import numpy as np
import pytest

from cuda.radixsort_tpu.models import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_flagship_runs(name):
    fn, args = REGISTRY[name](*([1 << 12] if name != "fk_join" else []))
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves and all(np.asarray(l).size >= 0 for l in leaves)
