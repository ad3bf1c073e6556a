#!/usr/bin/env python
"""On-chip fused-kernel parity check (VERDICT r4 item 6).

The CPU test suite exercises the fused Pallas conv in INTERPRET mode at
f32, which validates the kernel's logic but not the numerics of the
SHIPPED configuration: real Mosaic lowering with bf16 matmul operands.
This script runs on the attached TPU and compares the fused kernel
against the pure-XLA one-hot path — forward AND input/etype/filter
gradients — at the four flagship LDPC conv shapes plus an extension conv
and a softmax conv, both paths at their production precision.

Tolerance: both paths round matmul operands to bfloat16 (the MXU default
— the XLA path via the hardware, the kernel explicitly), but they sum in
different orders and split [x_i; x_i-x_j] differently, so results differ
by O(bf16 eps * sqrt(K*T)) relative.  rel-err <= 2e-2 matches the
bf16-policy bound already used by tests/test_policy.py:35; measured
errors are typically ~1e-3.

Max-tie note: gradients at EXACT message ties differ by design (first-win
vs even split, see ops/fused_mp.py); continuous random inputs here make
ties measure-zero.

Run: ``python benchmarks/tpu_parity_check.py`` (with the TPU env as-is).
Exits non-zero on failure; prints one JSON line per case.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

TOL = 2e-2


def rel_err(a, b):
    import numpy as np

    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def run_case(name, Ns, Nd, K, C, *, agg="max", ext=None, B=256, T=4,
             Cin=64):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fgnn_tpu.ops.fused_mp import fused_typed_mp
    from fgnn_tpu.ops.typed_mp import Extension, typed_mp_conv

    rng = np.random.RandomState(42)
    rows = Cin if ext is None else 2 * Cin
    x = jnp.asarray(rng.randn(B, Ns, Cin).astype(np.float32))
    nn = np.asarray(rng.randint(0, Ns, (Nd, K)), np.int32)
    et = jnp.asarray(rng.rand(B, Nd, K, T).astype(np.float32))
    w = jnp.asarray((rng.randn(rows, C * T) * 0.1).astype(np.float32))

    ext_enum = {None: Extension.NO_EXTENSION,
                "diff": Extension.ORIG_WITH_DIFF,
                "neighbor": Extension.ORIG_WITH_NEIGHBOR}[ext]

    def loss_fused(x, et, w):
        out = fused_typed_mp(x, nn, et, w, C, aggregator=agg,
                             extension=ext or "none")
        return jnp.sum(jnp.sin(out)), out

    def loss_xla(x, et, w):
        out = typed_mp_conv(x, nn, et, w, C, extension=ext_enum,
                            aggregator=agg)
        return jnp.sum(jnp.sin(out)), out

    gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2),
                                    has_aux=True))
    gx = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1, 2),
                                    has_aux=True))
    (lf, of), grads_f = gf(x, et, w)
    (lx, ox), grads_x = gx(x, et, w)
    jax.block_until_ready((grads_f, grads_x))

    errs = {"out": rel_err(of, ox)}
    for nm, a, b in zip(("dx", "detype", "dfilters"), grads_f, grads_x):
        errs[nm] = rel_err(a, b)
    ok = all(v <= TOL for v in errs.values())
    print(json.dumps({"case": name, "ok": ok,
                      **{k: round(v, 6) for k, v in errs.items()}}))
    return ok


def main():
    import jax

    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": "no TPU attached",
                          "backend": jax.default_backend()}))
        return 0

    from fgnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cases = [
        ("f2v_c64_max", dict(Ns=48, Nd=96, K=3, C=64)),
        ("v2f_c64_max", dict(Ns=96, Nd=48, K=6, C=64)),
        ("f2v_c128_max", dict(Ns=48, Nd=96, K=3, C=128)),
        ("v2f_c128_max", dict(Ns=96, Nd=48, K=6, C=128)),
        ("f2v_c64_softmax", dict(Ns=48, Nd=96, K=3, C=64, agg="softmax")),
        ("diff_c64_max", dict(Ns=96, Nd=96, K=4, C=64, ext="diff")),
    ]
    ok = True
    for name, kw in cases:
        ok = run_case(name, **kw) and ok
    print(json.dumps({"all_ok": ok, "tolerance": TOL}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
