"""Synthetic chain-MRF MAP trainers (the three train_syn_* references).

One engine, three workloads:
  * fixed — SynFixedModel over the variable chain (train_syn_fixed_pw_hop.py)
  * pw    — SynPwFactorModel, learned pairwise factors (train_syn_pw_factor.py)
  * hop   — SynHopFactorModel, learned pairwise + budget factors
            (train_syn_hop_factor.py)

Hyperparameters match the reference: Adam lr 3e-3, per-epoch LR x0.98,
grad-clip 1.0, CE loss over 2 classes, batch 32, accuracy reported against
the exact MAP labels with the LP-relaxation accuracy as the running
baseline.  Data is generated on the fly (the AD3 oracle is replaced by the
exact DP in fgnn_tpu.data.rpgm_oracle) or streamed from .npz shards
written by fgnn_tpu.data.generate.
"""

from __future__ import annotations

import argparse
import datetime
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import (
    RandomPGM,
    RandomPGMHop,
    RandomPGMPw,
    batches,
    chain_knn_table,
    global_factor_table,
    high_factor_table,
    pw_factor_table,
)
from ..models.synthetic import SynFixedModel, SynHopFactorModel, SynPwFactorModel
from ..utils import MetricsWriter, init_logger
from .common import (
    Schedules,
    TrainState,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    set_lr,
)


def make_syn_dataset(workload: str, args):
    """Construct the per-workload sample generator (pure numpy — safe to
    fork into worker pools before jax initializes)."""
    L = args.chain_length
    if workload == "fixed":
        return RandomPGM(L, args.hop_cap, hop_order=args.hop_order,
                         seed=args.seed)
    if workload == "pw":
        return RandomPGMPw(L, args.hop_cap, hop_order=args.hop_order,
                           ret_efeature=False, seed=args.seed)
    if workload == "hop":
        return RandomPGMHop(L, hop_order=args.hop_order,
                            ret_efeature_pw=False, seed=args.seed)
    raise ValueError(workload)


class SynWorkload:
    """Bundles model, static graph tables, and input packing per workload."""

    def __init__(self, workload: str, args):
        L = args.chain_length
        self.workload = workload
        dims = getattr(args, "dims", None)  # None -> reference FMPNN_DIMS
        dim_kw = {"dims": tuple(dims)} if dims else {}
        self.dataset = make_syn_dataset(workload, args)
        if workload == "fixed":
            self.model = SynFixedModel(variant=args.model_name)
            nn_idx, ef = chain_knn_table(L, args.neighbour)
            self.static = {"nn_idx": jnp.asarray(nn_idx),
                           "efeature": jnp.asarray(ef)}
        elif workload == "pw":
            self.model = SynPwFactorModel(**dim_kw)
            nn_pw, ef_pw = pw_factor_table(L)
            nn_high, ef_high, _ = global_factor_table(L, args.neighbour)
            self.static = {
                "nn_idx_pw": jnp.asarray(nn_pw), "ef_pw": jnp.asarray(ef_pw),
                "nn_idx_high": jnp.asarray(nn_high),
                "ef_high": jnp.asarray(ef_high),
            }
        elif workload == "hop" and getattr(args, "coo", False):
            # flat disjoint-union batching through the FactorGraph COO IR:
            # the model/params are identical to the dense path (see
            # tests/test_coo_batching.py).  --mixed-lengths "24,30,36"
            # batches HETEROGENEOUS chain lengths in every batch with zero
            # padding: each dataset sample is a composite group (one chain
            # per length), so shapes stay static and one compile covers
            # every batch while the flat union is genuinely ragged.
            from ..graph import build_joint_coo
            from ..models.synthetic import SynHopFactorModelCoo

            B = args.batch_size
            mixed = getattr(args, "mixed_lengths", "")
            lengths = ([int(x) for x in mixed.split(",") if x]
                       if mixed else [L])
            dist = getattr(args, "length_dist", "")

            def joint_tables(batch_lengths):
                pw_tabs = [pw_factor_table(Lx) for Lx in batch_lengths]
                hi_tabs = [high_factor_table(Lx, args.hop_order)
                           for Lx in batch_lengths]
                coo_pw, efe_pw, _ = build_joint_coo(
                    [t for t, _ in pw_tabs], [e for _, e in pw_tabs],
                    batch_lengths)
                coo_hi, efe_hi, _ = build_joint_coo(
                    [t for t, _ in hi_tabs], [e for _, e in hi_tabs],
                    batch_lengths)
                return {"coo_pw": coo_pw, "ef_pw": efe_pw,
                        "coo_high": coo_hi, "ef_high": efe_hi}

            self.buckets = None
            if dist:
                # BUCKETED ragged batching: chain lengths follow a real
                # distribution; each batch is homogeneous in length, one
                # compile per bucket (amortized), zero padding.
                from ..data import BucketedHopData

                probs = [float(x) for x in dist.split(",") if x]
                self.dataset = BucketedHopData(
                    lengths, probs, hop_order=args.hop_order,
                    ret_efeature_pw=False, seed=args.seed)
                self.buckets = {Lx: joint_tables([Lx] * B)
                                for Lx in lengths}
                self.static = self.buckets[lengths[0]]
            else:
                if mixed:
                    from ..data import MixedLengthHopData

                    self.dataset = MixedLengthHopData(
                        lengths, hop_order=args.hop_order,
                        ret_efeature_pw=False, seed=args.seed)
                # composite order, batch-major
                self.static = joint_tables(lengths * B)
            self.model = SynHopFactorModelCoo(hop_order=args.hop_order,
                                              **dim_kw)
            self.workload = "hop_coo"
        elif workload == "hop":
            self.model = SynHopFactorModel(hop_order=args.hop_order, **dim_kw)
            nn_pw, ef_pw = pw_factor_table(L)
            nn_high, ef_high = high_factor_table(L, args.hop_order)
            self.static = {
                "nn_idx_pw": jnp.asarray(nn_pw), "ef_pw": jnp.asarray(ef_pw),
                "nn_idx_high": jnp.asarray(nn_high),
                "ef_high": jnp.asarray(ef_high),
            }
        else:
            raise ValueError(workload)

    def model_inputs(self, batch: dict) -> dict:
        if self.workload == "fixed":
            return {"node_feature": batch["node_feature"], **self.static}
        if self.workload == "pw":
            return {"node_feature": batch["node_feature"],
                    "pws": batch["pws"], **self.static}
        if self.workload == "hop_coo":
            flat = lambda a: a.reshape((-1,) + a.shape[2:])  # noqa: E731
            static = self.static
            if getattr(self, "buckets", None):
                # bucketed mode: pick the tables matching this batch's
                # (homogeneous) chain length; jit retraces once per bucket
                static = self.buckets[int(batch["node_feature"].shape[1])]
            return {"node_feature": flat(batch["node_feature"]),
                    "pws": flat(batch["pws"]),
                    "hops": flat(batch["efeature_hop"]), **static}
        return {"node_feature": batch["node_feature"], "pws": batch["pws"],
                "hops": batch["efeature_hop"], **self.static}


def create_state(wl: SynWorkload, sample_batch: dict, seed: int,
                 base_lr: float = 3e-3):
    from functools import partial

    variables = jax.jit(partial(wl.model.init, train=True))(
        jax.random.PRNGKey(seed), **wl.model_inputs(sample_batch))
    tx = make_optimizer(base_lr, clip_norm=1.0)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        gcnt=jnp.asarray(0, jnp.int32),
    ), tx


def make_train_step(wl: SynWorkload, tx):
    from functools import partial

    # donate the carried state: in-place param/opt buffer reuse
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict):
        inputs = wl.model_inputs(batch)
        labels = batch["label"]

        def loss_fn(params):
            logits, upd = wl.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                **inputs, train=True, mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, 2), labels.reshape(-1)).mean()
            return ce, (logits, upd["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # labels follow the logits layout ((B, L) dense or (B*L,) flat COO)
        lab = labels.reshape(logits.shape[:-1])
        lp = batch["lp_label"].reshape(logits.shape[:-1])
        acc = jnp.mean((jnp.argmax(logits, -1) == lab).astype(jnp.float32))
        lp_acc = jnp.mean((lp == lab).astype(jnp.float32))
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, gcnt=state.gcnt + 1), \
            {"loss": loss, "acc": acc, "lp_acc": lp_acc}

    return step


def make_eval_step(wl: SynWorkload):
    @jax.jit
    def step(state: TrainState, batch: dict):
        logits = wl.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            **wl.model_inputs(batch), train=False)
        return jnp.argmax(logits, -1)

    return step


def train_and_eval(workload: str, args):
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    if getattr(args, "bf16", False):
        from ..models.policy import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    work = os.path.join(args.work_dir,
                        f"syn_{workload}_{args.model_name}_at_{stamp}")
    init_logger(os.path.join(work, "logs"), "train", print_log=True)
    logging.info("%s", args)
    writer = MetricsWriter(os.path.join(work, "tf_logs"))

    steps_per_epoch = args.train_size // args.batch_size

    # Data source priority: pre-generated .npz shards (reference workflow,
    # data_generate/) > multiprocess on-the-fly synthesis > inline.
    # NOTE: the worker pool must FORK before any jax computation initializes
    # the backend (forking a live multithreaded runtime deadlocks), so all
    # data plumbing happens before SynWorkload converts tables to device
    # arrays / the model state is created.
    train_path = getattr(args, "train_path", "")
    workers = getattr(args, "workers", 0)
    if train_path:
        from ..data.generate import NpzRPGMData

        npz = NpzRPGMData(train_path, size=args.train_size)
        steps_per_epoch = min(steps_per_epoch, len(npz) // args.batch_size)
        epoch_counter = [0]

        def batch_source(n, _npz=npz):
            epoch_counter[0] += 1
            return _npz.batches(args.batch_size, shuffle=True,
                                seed=args.seed + epoch_counter[0])
    pool = None
    if getattr(args, "mixed_lengths", "") or getattr(args, "length_dist", ""):
        # the ragged COO modes own their sampler (composite or bucketed);
        # the generic worker pool would synthesize plain fixed-length
        # chains and silently defeat them
        if workers:
            logging.info("--mixed-lengths/--length-dist: inline synthesis "
                         "(worker pool does not apply)")
        workers = 0
    if not train_path and workers:
        from ..data.loader import PoolBatcher

        ds_for_pool = make_syn_dataset(workload, args)
        pool = PoolBatcher(lambda d=ds_for_pool: d, args.batch_size,
                           n_workers=workers, seed=args.seed)
        batch_source = lambda n: pool.batches(n)  # noqa: E731
    elif not train_path:
        batch_source = None  # filled below once wl exists

    wl = SynWorkload(workload, args)
    if batch_source is None:
        if hasattr(wl.dataset, "batches"):  # BucketedHopData: the dataset
            batch_source = lambda n: wl.dataset.batches(args.batch_size, n)  # noqa: E731
        else:
            batch_source = lambda n: batches(wl.dataset, args.batch_size, n)  # noqa: E731
    sample = next(batch_source(1))
    state, tx = create_state(wl, sample, args.seed)
    train_step = make_train_step(wl, tx)
    sched = Schedules.exp_decay(0.98)

    start_epoch = 0
    if args.model_path and os.path.exists(args.model_path):
        state, start_epoch, _ = load_checkpoint(args.model_path, state)

    # --mesh DPxTP: shard training over a device mesh (batch axis = DP,
    # wide filter banks = TP); the static graph tables replicate.
    mesh_put = None
    if getattr(args, "mesh", ""):
        from jax.sharding import NamedSharding, PartitionSpec

        from .common import prepare_mesh_training

        mesh, state, mesh_put = prepare_mesh_training(
            args.mesh, state, args.batch_size)
        wl.static = {k: jax.device_put(v, NamedSharding(mesh, PartitionSpec()))
                     for k, v in wl.static.items()}
        logging.info("sharded training over mesh %s", dict(mesh.shape))

    gcnt = int(state.gcnt)
    try:
        for epoch in range(start_epoch, args.train_epoches):
            state = state.replace(
                opt_state=set_lr(state.opt_state, 3e-3 * sched(epoch)))
            t0 = time.time()
            acc_m = []
            from ..data import device_prefetch

            # batches staged on device from the prefetch thread; metrics kept
            # on device until the logging boundary; host-side step counter —
            # per-step device_get is a full RPC round trip on a tunneled TPU
            with device_prefetch(batch_source(steps_per_epoch),
                                 put=mesh_put) as staged:
                for bcnt, batch in enumerate(staged):
                    state, m = train_step(state, batch)
                    acc_m.append(m)
                    gcnt += 1
                    if gcnt % 10 == 0:
                        host = jax.device_get(acc_m)
                        mm = {k: float(np.mean([x[k] for x in host]))
                              for k in host[0]}
                        acc_m = []
                        for k, v in mm.items():
                            writer.add_scalar(f"syn_train/{k}", v, gcnt)
                        logging.info("epoch=%d bcnt=%d %s", epoch, bcnt,
                                     {k: round(v, 4) for k, v in mm.items()})
            save_checkpoint(os.path.join(work, "latest.ckpt"), state, epoch + 1)
            logging.info("epoch %d done in %.1fs", epoch, time.time() - t0)
    finally:
        if pool is not None:
            pool.close()

    # ---- test ----
    eval_step = make_eval_step(wl)
    eval_batches = max(args.test_size // args.batch_size, 1)
    accs, lp_accs = [], []
    # eval from a pre-generated oracle-labelled set when given (the
    # reference workflow: generate_rpgm_dataset.sh writes train+test
    # shards and train_syn_hop_factor.py:215-220 reads the test shard);
    # otherwise draw fresh oracle-labelled samples inline.
    test_path = getattr(args, "test_path", "")
    if test_path:
        from ..data.generate import NpzRPGMData

        test_npz = NpzRPGMData(test_path, size=args.test_size)
        eval_batches = min(eval_batches, len(test_npz) // args.batch_size)
        if eval_batches < 1:
            raise ValueError(
                f"test set {test_path!r} has {len(test_npz)} samples, "
                f"fewer than one batch of {args.batch_size} — lower "
                "--batch-size or use a larger test shard")
        eval_source = test_npz.batches(args.batch_size, shuffle=False)
        eval_source = (b for _, b in zip(range(eval_batches), eval_source))
    elif hasattr(wl.dataset, "batches"):
        eval_source = wl.dataset.batches(args.batch_size, eval_batches)
    else:
        eval_source = batches(wl.dataset, args.batch_size, eval_batches)
    for batch in eval_source:
        pred = np.asarray(eval_step(state, batch)).reshape(
            batch["label"].shape)
        accs.append((pred == batch["label"]).mean())
        lp_accs.append((batch["lp_label"] == batch["label"]).mean())
    acc, lp_acc = float(np.mean(accs)), float(np.mean(lp_accs))
    logging.info("testing result: acc = %.4f, acc_lp = %.4f", acc, lp_acc)
    writer.add_scalar("syn_test/acc", acc, int(state.gcnt))
    writer.add_scalar("syn_test/lp_acc", lp_acc, int(state.gcnt))
    writer.close()
    return acc, lp_acc


def parse_args(argv=None, workload: str = "fixed"):
    p = argparse.ArgumentParser(description=f"fgnn_tpu synthetic trainer ({workload})")
    p.add_argument("--chain-length", "--chain_length", type=int, default=30)
    p.add_argument("--hop-cap", "--hop_cap", type=int, default=5)
    p.add_argument("--hop-order", "--hop_order", type=int, default=9)
    p.add_argument("--train-epoches", "--train_epoches", type=int, default=10)
    p.add_argument("--model-path", "--model_path", type=str, default="")
    p.add_argument("--model-name", "--model_name", type=str,
                   default="mp_nn" if workload == "fixed" else "mp_nn_factor")
    p.add_argument("--neighbour", type=int, default=8)
    p.add_argument("--train-size", "--train_size", type=int, default=90000)
    p.add_argument("--test-size", "--test_size", type=int, default=10000)
    p.add_argument("--batch-size", "--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--work-dir", type=str, default="runs")
    p.add_argument("--workers", type=int,
                   default=max(1, min(8, (os.cpu_count() or 2) - 1)),
                   help="multiprocess sample-synthesis workers (0 = inline)")
    p.add_argument("--train-path", "--train_path", type=str, default="",
                   help="pre-generated .npz dataset (fgnn_tpu.data.generate)")
    p.add_argument("--test-path", "--test_path", type=str, default="",
                   help="pre-generated .npz eval dataset; empty = fresh "
                        "oracle-labelled samples synthesized inline")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 compute policy (f32 params/stats)")
    p.add_argument("--mesh", type=str, default="",
                   help="DPxTP device mesh for sharded training "
                        "(e.g. 8x1, 4x2, or 'auto'); empty = single device")
    p.add_argument("--coo", action="store_true", default=False,
                   help="(hop) batch via the FactorGraph COO disjoint union "
                        "instead of dense (B, N, K) tables")
    p.add_argument("--mixed-lengths", "--mixed_lengths", type=str, default="",
                   help="(hop --coo) comma list of chain lengths; every "
                        "batch holds batch-size groups with one chain per "
                        "length, flat-batched with zero padding")
    p.add_argument("--length-dist", "--length_dist", type=str, default="",
                   help="(hop --coo, with --mixed-lengths) comma list of "
                        "probabilities, one per length: chains draw their "
                        "length from this distribution and batches are "
                        "BUCKETED per length (one compile per bucket, "
                        "zero padding)")
    return p.parse_args(argv)
