"""Construction/forward tests for every synthetic model-zoo variant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fgnn_tpu.data import chain_knn_table
from fgnn_tpu.models import SynFixedModel


@pytest.mark.parametrize("variant", ["mp_nn", "mp_nn_comp", "simple_gnn", "iid"])
def test_fixed_variant_forward(variant, rng):
    L, k = 10, 4
    nn_idx, ef = chain_knn_table(L, k)
    x = jnp.asarray(rng.randn(2, L, 2).astype(np.float32))
    model = SynFixedModel(variant=variant)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, jnp.asarray(nn_idx),
                           jnp.asarray(ef), train=True))()
    out, _ = model.apply(variables, x, jnp.asarray(nn_idx), jnp.asarray(ef),
                         train=True, mutable=["batch_stats"])
    assert out.shape == (2, L, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_chain_knn_table_reference_quirk():
    """The asymmetric window (train_syn_fixed_pw_hop.py:86-101): k slots but
    only k-1 real neighbors; the last slot stays 0 (clamped)."""
    nn_idx, ef = chain_knn_table(12, 8)
    assert nn_idx.shape == (12, 8)
    # row 6: range(2,6)+range(7,10) = 7 entries; slot 7 left at 0
    np.testing.assert_array_equal(nn_idx[6], [2, 3, 4, 5, 7, 8, 9, 0])
    # boundary clamping at row 0
    assert nn_idx[0, 0] == 0
