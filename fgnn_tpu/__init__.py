"""fgnn_tpu — a TPU-native factor-graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zzhang1987/Factor-Graph-Neural-Network (arXiv:1906.00554): factor-graph
message passing networks (Variable-to-Factor / Factor-to-Variable modules
generalizing max-product belief propagation), with two workload families:

  * MAP inference on synthetic chain MRFs with higher-order budget factors
    (reference: train_syn_*.py)
  * neural LDPC decoding of the MacKay 96.3.963 code under AWGN + burst
    noise (reference: train_ldpc.py)

Layout conventions (TPU-first, differs from the reference's ``b x c x n x 1``):
features are stored ``(batch, nodes, channels)`` so the channel dim maps to
TPU lanes and per-node MLPs become plain MXU matmuls.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from .graph import FactorGraph  # noqa: F401


def __getattr__(name):
    # lazy subpackage access: fgnn_tpu.models / .data / .parallel / .train
    # without paying their import cost (flax, scipy) on bare `import fgnn_tpu`
    if name in ("models", "data", "parallel", "train", "utils"):
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(name)
