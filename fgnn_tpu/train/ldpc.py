"""LDPC neural-decoder training / evaluation (reference train_ldpc.py).

Workload: decode the MacKay 96.3.963 code under AWGN + burst noise.
Training data is synthesized on the fly (ContinuousCodesSP); evaluation is
the 5 SNR x 6 sigma_b BER matrix over a pre-generated grid.

Reference hyperparameters reproduced: Adam lr 1e-2 wd 1e-8
(train_ldpc.py:160-161), warmup-then-0.99-decay per-epoch LR
(train_ldpc.py:163-169), loss = BCE-with-logits over the 48 info bits +
0.1 * MSE on the predicted 10^(sigma_b/20) (train_ldpc.py:222-227),
batch 32, 10k samples/epoch.
"""

from __future__ import annotations

import argparse
import datetime
import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import Codes, ContinuousCodesSP, generate_eval_set
from ..models import LDPCModel
from ..utils import MetricsWriter, init_logger
from .common import (
    Schedules,
    TrainState,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    set_lr,
)

N_INFO = 48


def create_state(model: LDPCModel, sample_batch: dict, seed: int = 0,
                 base_lr: float = 1e-2, bp_features: bool = False):
    inputs = _model_inputs(sample_batch, bp_features=bp_features)
    # jit the init: eager init dispatches hundreds of tiny ops, which is
    # pathological over a remote-device transport
    variables = jax.jit(partial(model.init, train=True))(
        jax.random.PRNGKey(seed), **inputs)
    tx = make_optimizer(base_lr, weight_decay=1e-8)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        gcnt=jnp.asarray(0, jnp.int32),
    ), tx


_BP_ARRAYS = None


def _bp_arrays():
    """TPU-batched-BP tables for the A2 joint graph (trace-time consts)."""
    global _BP_ARRAYS
    if _BP_ARRAYS is None:
        from ..data.ldpc_datasets import decode_graph
        from ..ops.bp import BPGraphArrays

        _BP_ARRAYS = BPGraphArrays.from_ref(decode_graph())
    return _BP_ARRAYS


def _augment_bp_features(node_feature, max_loops: int = 50):
    """--bp-features: append sum-product posteriors to the node features.

    The round-3/4 clean-channel result (RESULTS.md) is that the FGNN
    decoder trails classical BP on the sigma_b <= 1 cells where AWGN is
    exact and BP is near-ML.  This experiment hands the model BP's own
    posterior (centered, 2*q1-1) plus its syndrome-convergence flag as
    extra input features, so the network can LEARN the decision boundary
    "trust BP when it converged, repair it in the burst band" instead of
    rediscovering BP from scratch.  The decode runs on-device (batched
    JAX sum-product, ops/bp.py) inside the jitted train/eval steps from
    the same nominal-channel bias the reference's y2b produces
    (/root/reference/lib/data/MNC/MNC_py.cpp:104-108).
    """
    from ..ops.bp import bp_decode_batch

    y = node_feature[..., 0]
    snr_db = node_feature[..., 1]
    gcx = jnp.power(10.0, snr_db / 20.0)
    bias = 1.0 / (1.0 + jnp.exp(-2.0 * gcx * y))
    _, ok, _, q1 = bp_decode_batch(_bp_arrays(), bias, max_loops=max_loops,
                                   return_posterior=True)
    extra = jnp.stack([2.0 * q1 - 1.0,
                       jnp.broadcast_to(ok[:, None].astype(jnp.float32),
                                        q1.shape)], axis=-1)
    return jnp.concatenate([node_feature, extra.astype(node_feature.dtype)],
                           axis=-1)


_STATIC_TABLES = None


def _static_tables():
    """The 96.3.963 incidence tables as host-side numpy constants."""
    global _STATIC_TABLES
    if _STATIC_TABLES is None:
        from ..data.ldpc_graph import default_structure

        s = default_structure()
        _STATIC_TABLES = (np.asarray(s.var_checks, np.int32),
                          np.asarray(s.factors, np.int32))
    return _STATIC_TABLES


_TABLES_VALIDATED = None  # verdict of the last CONCRETE value check


def _model_inputs(batch: dict, bp_features: bool = False) -> dict:
    # The 96.3.963 incidence tables are the same for every sample; pass
    # them SHARED (2D) and as TRACE-TIME CONSTANTS (numpy, not a slice of
    # the traced batch) so the gather has no batch dim and the fused
    # Pallas kernel can engage (ops/fused_mp.py builds its one-hot
    # operator from the concrete table at trace time).
    #
    # Substitution is gated on VALUE equality, not just shape: a custom
    # parity-check matrix with the standard (96,3)/(48,6) shapes must NOT
    # silently train on the default graph.  Values are checked when the
    # batch is concrete (create_state always sees one); traced calls
    # (inside the jitted step, where the tables are tracers) reuse the
    # last concrete verdict and fall back to the in-batch tables when no
    # concrete batch has validated yet.
    global _TABLES_VALIDATED
    nn_f2v = batch["nn_idx_f2v"]
    nn_v2f = batch["nn_idx_v2f"]
    st_f2v, st_v2f = _static_tables()
    use_static = False
    if tuple(nn_f2v.shape[-2:]) == st_f2v.shape and \
            tuple(nn_v2f.shape[-2:]) == st_v2f.shape:
        try:
            cf, cv = np.asarray(nn_f2v), np.asarray(nn_v2f)
        except Exception:  # tracer — reuse the last concrete verdict
            use_static = bool(_TABLES_VALIDATED)
        else:
            _TABLES_VALIDATED = bool(
                np.array_equal(cf, np.broadcast_to(st_f2v, cf.shape))
                and np.array_equal(cv, np.broadcast_to(st_v2f, cv.shape)))
            use_static = _TABLES_VALIDATED
    if use_static:
        nn_f2v, nn_v2f = st_f2v, st_v2f
    elif hasattr(nn_f2v, "ndim") and nn_f2v.ndim == 3:
        nn_f2v = nn_f2v[0]
        nn_v2f = nn_v2f[0]
    node_feature = batch["node_feature"]
    if bp_features:
        node_feature = _augment_bp_features(jnp.asarray(node_feature))
    return {
        "node_feature": node_feature,
        "hop_feature": batch["hop_feature"],
        "nn_idx_f2v": nn_f2v,
        "nn_idx_v2f": nn_v2f,
        "efeature_f2v": batch["efeature_f2v"],
        "efeature_v2f": batch["efeature_v2f"],
    }


def make_train_step(model: LDPCModel, tx, clean_weight: float = 0.0,
                    bp_features: bool = False):
    # donate the carried state: params/opt buffers update in place, which
    # also removes a pile of defensive copies from the compiled step
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict):
        inputs = _model_inputs(batch, bp_features=bp_features)
        label = batch["label"][:, :N_INFO].astype(jnp.float32)
        sigma_target = jnp.power(10.0, batch["sigma_b"].astype(jnp.float32) / 20.0)

        def loss_fn(params):
            (logits, sb_pred), upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                **inputs, train=True, mutable=["batch_stats"])
            per_bit = optax.sigmoid_binary_cross_entropy(
                logits.reshape(label.shape), label)
            if clean_weight:
                # --clean-weight: upweight the sigma_b <= 1 samples, where
                # classical BP is near-ML and the r3/r4 models kept
                # trading clean-channel accuracy for the burst band
                w = 1.0 + clean_weight * (
                    batch["sigma_b"].astype(jnp.float32).reshape(-1)
                    <= 1.0)
                bce = jnp.sum(w * per_bit.mean(axis=-1)) / jnp.sum(w)
            else:
                bce = per_bit.mean()
            mse = jnp.mean(jnp.square(sb_pred.reshape(-1) - sigma_target.reshape(-1)))
            return bce + 0.1 * mse, (bce, mse, logits, upd["batch_stats"])

        (loss, (bce, mse, logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(((logits > 0).astype(jnp.int32)
                        == batch["label"][:, :N_INFO]).astype(jnp.float32))
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            gcnt=state.gcnt + 1)
        return new_state, {"loss": bce, "sigma_b_loss": mse, "acc": acc}

    return train_step


def make_eval_step(model: LDPCModel, bp_features: bool = False):
    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        (logits, _) = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            **_model_inputs(batch, bp_features=bp_features), train=False)
        return (logits >= 0).astype(jnp.int32)

    return eval_step


def train(args, model, writer, model_dir):
    dataset = ContinuousCodesSP(length=args.samples_per_epoch, snr=args.snr,
                                seed=args.seed)
    # The worker pool must FORK before jax initializes its backend (below,
    # at create_state) — forking a live multithreaded runtime deadlocks.
    pool = None
    if getattr(args, "workers", 0):
        from ..data.loader import PoolBatcher

        spe = args.samples_per_epoch
        snr, seed = args.snr, args.seed
        pool = PoolBatcher(
            lambda: ContinuousCodesSP(length=spe, snr=snr, seed=seed),
            args.batch_size, n_workers=args.workers, seed=args.seed)
    sample_batch = next(dataset.batches(args.batch_size))
    bp_feats = getattr(args, "bp_features", False)
    state, tx = create_state(model, sample_batch, seed=args.seed,
                             bp_features=bp_feats)
    train_step = make_train_step(
        model, tx, clean_weight=getattr(args, "clean_weight", 0.0),
        bp_features=bp_feats)
    sched = Schedules.ldpc()

    start_epoch = 0
    ckpt_path = os.path.join(model_dir, "ldpc_latest.ckpt")
    if args.model_path and os.path.exists(args.model_path):
        state, start_epoch, _ = load_checkpoint(args.model_path, state)

    # --mesh DPxTP: shard the training over a device mesh.  Batches shard
    # on the batch axis (DP — BatchNorm stats stay global under jit, true
    # SyncBatchNorm), wide filter banks shard over the model axis (TP).
    mesh_put = None
    if getattr(args, "mesh", ""):
        from .common import prepare_mesh_training

        mesh, state, mesh_put = prepare_mesh_training(
            args.mesh, state, args.batch_size)
        logging.info("sharded training over mesh %s", dict(mesh.shape))

    steps_per_epoch = args.steps_per_epoch or (len(dataset) // args.batch_size)
    logging.info("training: %d epochs x %d steps", args.n_epochs, steps_per_epoch)

    gcnt = int(state.gcnt)
    try:
        for epoch in range(start_epoch, args.n_epochs):
            state = state.replace(opt_state=set_lr(state.opt_state,
                                                   1e-2 * sched(epoch)))
            t0 = time.time()
            metrics_acc = []
            from itertools import islice

            from ..data import device_prefetch

            # device_prefetch stages batches on device from a background
            # thread; metrics stay on device until the logging boundary, and
            # the step counter is tracked host-side — a per-step device_get
            # is a full RPC round trip on a tunneled TPU.  The source is
            # capped with islice (not a mid-stream break) so the prefetch
            # thread terminates with the epoch instead of blocking on a
            # full queue.
            source = (pool.batches(steps_per_epoch) if pool is not None
                      else islice(dataset.batches(args.batch_size),
                                  steps_per_epoch))
            with device_prefetch(source, put=mesh_put) as staged:
                for bcnt, batch in enumerate(staged):
                    state, m = train_step(state, batch)
                    metrics_acc.append(m)
                    gcnt += 1
                    if gcnt % 10 == 0:
                        host = jax.device_get(metrics_acc)
                        mm = {k: float(np.mean([x[k] for x in host]))
                              for k in host[0]}
                        metrics_acc = []
                        writer.add_scalar("syn_train/loss", mm["loss"], gcnt)
                        writer.add_scalar("syn_train/sigma_b_loss",
                                          mm["sigma_b_loss"], gcnt)
                        writer.add_scalar("syn_train/acc", mm["acc"], gcnt)
                        logging.info("epoch=%d bcnt=%d loss=%.4f acc=%.4f",
                                     epoch, bcnt, mm["loss"], mm["acc"])
            logging.info("epoch %d done in %.1fs", epoch, time.time() - t0)
            save_checkpoint(ckpt_path, state, epoch + 1)
    finally:
        if pool is not None:
            pool.close()
    save_checkpoint(os.path.join(model_dir, "ldpc_final.ckpt"), state,
                    args.n_epochs)
    return state


def evaluate(args, model, state=None):
    """BER matrix eval (train_ldpc.py:262-327)."""
    if not os.path.exists(args.test_path):
        logging.info("generating eval set at %s", args.test_path)
        generate_eval_set(args.test_path, n_per_cell=args.eval_per_cell,
                          with_bp_error=args.eval_bp_baseline)
    ds = Codes(args.test_path)
    bp_feats = getattr(args, "bp_features", False)
    if state is None:
        sample = next(ds.batches(args.batch_size))
        state, _ = create_state(model, sample, bp_features=bp_feats)
        state, _, _ = load_checkpoint(args.model_path, state)
    eval_step = make_eval_step(model, bp_features=bp_feats)

    snrs, sbs = [0, 1, 2, 3, 4], [0, 1, 2, 3, 4, 5]
    acc_cnt = np.zeros((len(snrs), len(sbs)))
    acc_tot = np.zeros((len(snrs), len(sbs)))
    correct = 0
    total = 0
    from ..data import prefetch

    # dispatch all eval batches asynchronously (host-side metadata kept as
    # numpy); one bulk device_get at the end instead of a blocking
    # readback per batch
    hosts = []
    preds = []
    for batch in prefetch(ds.batches(args.batch_size)):
        preds.append(eval_step(state, batch))
        hosts.append({k: np.asarray(batch[k]) for k in
                      ("label", "snr_db", "sigma_b")})
    preds = jax.device_get(preds)
    for pred, hb in zip(preds, hosts):
        label = hb["label"][:, :N_INFO]
        snr = hb["snr_db"]
        sb = hb["sigma_b"]
        for i, s in enumerate(snrs):
            for j, b in enumerate(sbs):
                sel = (np.abs(snr - s) < 1e-3) & (sb.astype(int) == b)
                acc_cnt[i, j] += np.sum(pred[sel, :N_INFO] == label[sel])
                acc_tot[i, j] += sel.sum() * N_INFO
        correct += np.sum(pred[:, :N_INFO] == label)
        total += label.size
    ber_total = 1.0 - correct / max(total, 1)
    err = 1.0 - np.divide(acc_cnt, np.maximum(acc_tot, 1))
    print(ber_total)
    print(np.array_str(err, precision=4, suppress_small=True))
    data = dict(np.load(args.test_path))
    if "bp_err_matrix" in data and data["bp_err_matrix"].any():
        print("sum-product baseline:")
        print(np.array_str(data["bp_err_matrix"], precision=4,
                           suppress_small=True))
    return ber_total, err


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="fgnn_tpu LDPC trainer")
    p.add_argument("--n-epochs", "--n_epochs", type=int, default=10)
    p.add_argument("--model-path", "--model_path", type=str, default="")
    p.add_argument("--model-name", "--model_name", type=str, default="FactorNN")
    p.add_argument("--snr", type=int, default=None)
    p.add_argument("--test-path", "--test_path", type=str,
                   default="dataset/ldpc_valid.npz")
    p.add_argument("--train", action="store_true", default=False)
    p.add_argument("--batch-size", "--batch_size", type=int, default=32)
    p.add_argument("--aggregator", type=str, default="max")
    p.add_argument("--samples-per-epoch", type=int, default=10000)
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="override for smoke tests")
    p.add_argument("--eval-per-cell", type=int, default=1000)
    p.add_argument("--eval-bp-baseline", type=lambda s: s != "0", default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--work-dir", type=str, default="runs")
    p.add_argument("--workers", type=int, default=0,
                   help="multiprocess sample-synthesis workers (0 = inline)")
    p.add_argument("--clean-weight", "--clean_weight", type=float,
                   default=0.0,
                   help="extra loss weight on sigma_b<=1 samples (the "
                        "clean-channel cells where BP is near-ML); 0=off")
    p.add_argument("--bp-features", "--bp_features", action="store_true",
                   default=False,
                   help="append on-device sum-product posteriors + the "
                        "BP convergence flag to the node features")
    p.add_argument("--mesh", type=str, default="",
                   help="DPxTP device mesh for sharded training "
                        "(e.g. 8x1, 4x2, or 'auto' = pure DP over all "
                        "devices); empty = single device")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 compute policy (f32 params/stats); trains "
                        "to the same BER at ~1.2x step throughput")
    return p.parse_args(argv)


def main(argv=None):
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    if args.bf16:
        from ..models.policy import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)
    model = LDPCModel(aggregator=args.aggregator)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    subdir = f"ldpc_{args.model_name}_snr_{args.snr}_at_{stamp}"
    work = os.path.join(args.work_dir, subdir)
    init_logger(os.path.join(work, "logs"), "train", print_log=True)
    logging.info("%s", args)
    if args.train:
        writer = MetricsWriter(os.path.join(work, "tf_logs"))
        state = train(args, model, writer, work)
        writer.close()
    else:
        evaluate(args, model)


if __name__ == "__main__":
    main()
