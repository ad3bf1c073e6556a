"""LDPC encode + AWGN/burst channel + bit posteriors (host-side numpy).

Functional equivalents of the reference MNC ops (behavioral spec at
/root/reference/lib/data/MNC/MNC_py.cpp):

  * ``encode``  == s2t (MNC_py.cpp:22-83): block-encode a bit stream with
    the dense GF(2) generator matrix; emits [s ; t] per K-bit block
    (t = G s mod 2), zero-padding the final partial block.
  * ``channel`` == t2y (MNC_py.cpp:86-102): BPSK at amplitude
    gcx = 10^(snr_db/20), unit AWGN, plus burst noise N(0, (gcx*sigma_b)^2)
    added per-sample with probability rho when sigma_b > 0.
  * ``posteriors`` == y2b (MNC_py.cpp:104-108): P(bit=1|y) =
    1/(1+exp(-2*gcx*y)).

The sum-product decoder lives in bp_ref.py (numpy), ldpc_cpp/ (native C++)
and ops/bp.py (batched JAX, runs on TPU).
"""

from __future__ import annotations

import numpy as np

from .alist import default_paths, read_mod2mat

_G_CACHE: dict = {}


def load_generator(path: str | None = None) -> np.ndarray:
    path = path or default_paths()["G"]
    if path not in _G_CACHE:
        _G_CACHE[path] = read_mod2mat(path)
    return _G_CACHE[path]


def encode(source_bits: np.ndarray, K: int = 48, N: int = 48,
           g_path: str | None = None, include_source: bool = True) -> np.ndarray:
    """Block-encode a flat bit stream; returns [s ; t] per block (s2t)."""
    G = load_generator(g_path)
    assert G.shape == (N, K), G.shape
    s = np.asarray(source_bits, dtype=np.int64).ravel()
    nblocks = -(-s.size // K)
    padded = np.zeros(nblocks * K, dtype=np.int64)
    padded[: s.size] = s
    blocks = padded.reshape(nblocks, K)
    t = (blocks @ G.T) % 2
    if include_source:
        out = np.concatenate([blocks, t], axis=1)
    else:
        out = t
    return out.reshape(-1)


def snr_amplitude(snr_db: float) -> float:
    return float(10.0 ** (snr_db / 20.0))


def channel(t: np.ndarray, snr_db: float, sigma_b: float,
            burst_prob: float = 0.05, rng: np.random.RandomState | None = None
            ) -> np.ndarray:
    """BPSK + AWGN + bursty noise (t2y)."""
    rng = rng or np.random
    gcx = snr_amplitude(snr_db)
    t = np.asarray(t, dtype=np.float64)
    y = 2.0 * gcx * (t - 0.5) + rng.randn(t.size)
    if sigma_b >= 1e-20:
        burst = rng.rand(t.size) < burst_prob
        y = y + burst * rng.randn(t.size) * (gcx * sigma_b)
    return y


def posteriors(y: np.ndarray, snr_db: float) -> np.ndarray:
    """Bit posteriors P(x=1|y) under the nominal (non-burst) channel (y2b)."""
    gcx = snr_amplitude(snr_db)
    return 1.0 / (1.0 + np.exp(-2.0 * gcx * np.asarray(y, np.float64)))
