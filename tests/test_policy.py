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


def test_fused_kernel_under_bf16_policy(rng, monkeypatch):
    """The bench/flagship combination: bf16 compute policy batches through
    the fused kernel (interpret mode on CPU) and stays close to the f32
    XLA path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fgnn_tpu.models.mp_conv import MPConv
    from fgnn_tpu.models.policy import set_compute_dtype
    from fgnn_tpu.ops import Extension

    monkeypatch.setenv("FGNN_FUSED", "1")
    B, N, Cin, Nd, K, T, C = 8, 16, 8, 16, 3, 4, 16
    x = jnp.asarray(rng.randn(B, N, Cin), jnp.float32)
    nn = rng.randint(0, N, (Nd, K)).astype(np.int32)
    et = jnp.asarray(rng.randn(B, Nd, K, T), jnp.float32)
    conv = MPConv(nout=C, nedge_types=T, extension=Extension.NO_EXTENSION,
                  aggregator="max", use_bn=False)
    variables = conv.init(jax.random.PRNGKey(0), x, nn, et, train=False)

    ref = conv.apply(variables, x, nn, et, train=False)
    try:
        set_compute_dtype(jnp.bfloat16)
        got = conv.apply(variables, x, nn, et, train=False)
        g = jax.grad(lambda v: jnp.sum(
            conv.apply(v, x, nn, et, train=False)))(variables)
    finally:
        set_compute_dtype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g))


def test_mesh_training_registers_spmd_mesh(monkeypatch, rng):
    """prepare_mesh_training registers the mesh for the fused kernel's
    shard_map hook (r5 SPMD rule) and leaves FGNN_FUSED alone — the
    round-4 behavior of pinning the XLA path under a mesh is gone."""
    import os

    import jax
    import jax.numpy as jnp

    from fgnn_tpu.parallel.mesh import set_spmd_mesh, spmd_mesh
    from fgnn_tpu.train.common import TrainState, make_optimizer, \
        prepare_mesh_training

    params = {"w": jnp.ones((4, 4))}
    tx = make_optimizer(1e-3)
    state = TrainState(params=params, batch_stats={},
                       opt_state=tx.init(params),
                       gcnt=jnp.asarray(0, jnp.int32))
    monkeypatch.delenv("FGNN_FUSED", raising=False)
    set_spmd_mesh(None)
    mesh, _, _ = prepare_mesh_training(
        "4x2", state, 8, devices=jax.devices("cpu")[:8])
    assert os.environ.get("FGNN_FUSED") is None
    reg, axis = spmd_mesh()
    assert reg is mesh and axis == "data"
