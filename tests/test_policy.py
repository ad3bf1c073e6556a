"""Mixed-precision policy: bf16 compute path stays close to f32."""

import numpy as np
import jax
import jax.numpy as jnp

from fgnn_tpu.models import LDPCModel
from fgnn_tpu.models.policy import compute_dtype, get_compute_dtype


def test_bf16_policy_close_to_f32(rng):
    model = LDPCModel(dim_mapping_list=(16, 16), skip_link={})
    B = 2
    inputs = dict(
        node_feature=jnp.asarray(rng.randn(B, 96, 2).astype(np.float32)),
        hop_feature=jnp.asarray(rng.randn(B, 48, 6).astype(np.float32)),
        nn_idx_f2v=jnp.asarray(rng.randint(0, 48, (B, 96, 3)).astype(np.int32)),
        nn_idx_v2f=jnp.asarray(rng.randint(0, 96, (B, 48, 6)).astype(np.int32)),
        efeature_f2v=jnp.asarray(rng.randn(B, 96, 3, 7).astype(np.float32)),
        efeature_v2f=jnp.asarray(rng.randn(B, 48, 6, 7).astype(np.float32)),
    )
    variables = model.init(jax.random.PRNGKey(0), **inputs, train=False)
    ref, _ = model.apply(variables, **inputs, train=False)
    assert get_compute_dtype() is None
    with compute_dtype(jnp.bfloat16):
        got, _ = model.apply(variables, **inputs, train=False)
    assert get_compute_dtype() is None
    # bf16 has ~3 decimal digits; outputs should agree loosely
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.1)
    assert np.isfinite(np.asarray(got, np.float32)).all()
