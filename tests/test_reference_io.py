"""Round-trip tests for the reference on-disk dataset formats.

Writes files in EXACTLY the byte layout the reference produces — a
pickle-per-sample stream in the reference's channel-first shapes
(generate_random_pgm.py:34-40) and a torch.save eval dict
(ldpc_dataset.py:132-156) — then loads them through the converters and
the normal fgnn_tpu dataset readers end to end.
"""

import os
import pickle

import numpy as np
import pytest

from fgnn_tpu.data.generate import NpzRPGMData
from fgnn_tpu.data.reference_io import (
    convert_reference_ldpc_pt,
    convert_reference_rpgm,
    read_reference_rpgm,
)

L, H = 12, 5


def _write_reference_stream(path, pgm_type, n, rng):
    samples = []
    with open(path, "wb") as f:
        for _ in range(n):
            nf = rng.rand(2, L).astype(np.float32)          # channel-first
            assign = rng.randint(0, 2, (L,)).astype(np.int64)
            assign1 = rng.randint(0, 2, (L,)).astype(np.int64)
            pw = rng.rand(4, L, 1).astype(np.float32)
            hop = rng.rand(H, L, 1).astype(np.float32)
            if pgm_type == "raw":
                item = (nf, assign, assign1)
            elif pgm_type == "pws":
                item = (nf, pw, assign, assign1)
            else:
                item = (nf, pw, hop, assign, assign1)
            pickle.dump(item, f)
            samples.append(item)
    return samples


@pytest.mark.parametrize("pgm_type", ["raw", "pws", "hops"])
def test_rpgm_stream_roundtrip(tmp_path, rng, pgm_type):
    src = str(tmp_path / "ref.dat")
    samples = _write_reference_stream(src, pgm_type, 6, rng)
    data = read_reference_rpgm(src, pgm_type)
    assert data["node_feature"].shape == (6, L, 2)
    np.testing.assert_array_equal(data["node_feature"][2],
                                  samples[2][0].T)
    np.testing.assert_array_equal(data["label"][3], samples[3][-2])
    np.testing.assert_array_equal(data["lp_label"][4], samples[4][-1])
    if pgm_type in ("pws", "hops"):
        np.testing.assert_array_equal(
            data["pws"][1], samples[1][1].squeeze(-1).T)
    if pgm_type == "hops":
        assert data["efeature_hop"].shape == (6, L, H)
        np.testing.assert_array_equal(
            data["efeature_hop"][0], samples[0][2].squeeze(-1).T)


def test_rpgm_convert_feeds_npz_reader(tmp_path, rng):
    """Converted file loads through NpzRPGMData and batches like ours."""
    src = str(tmp_path / "ref_hops.dat")
    _write_reference_stream(src, "hops", 8, rng)
    out = str(tmp_path / "hops.npz")
    convert_reference_rpgm(src, "hops", out)
    ds = NpzRPGMData(out)
    assert len(ds) == 8
    batch = next(ds.batches(4, shuffle=False))
    assert batch["node_feature"].shape == (4, L, 2)
    assert batch["efeature_hop"].shape == (4, L, H)
    assert batch["pws"].shape == (4, L, 4)
    assert set(batch) >= {"node_feature", "label", "lp_label"}


def test_ldpc_pt_roundtrip(tmp_path, rng):
    """A reference-layout torch .pt eval dict converts and feeds Codes."""
    torch = pytest.importorskip("torch")

    n = 5
    d = {
        "noizy_sg": torch.tensor(rng.randn(n, 96).astype(np.float32)),
        "gts": torch.tensor(rng.randint(0, 2, (n, 96))),
        "snr_dbs": torch.tensor(
            np.repeat(rng.choice([0.0, 2.0], n)[:, None], 96, 1).astype(
                np.float32)),
        "sigma_b": torch.tensor(rng.rand(n).astype(np.float32)),
    }
    src = str(tmp_path / "test.pt")
    torch.save(d, src)
    out = str(tmp_path / "codes.npz")
    convert_reference_ldpc_pt(src, out)

    from fgnn_tpu.data.ldpc_datasets import Codes

    ds = Codes(out)
    assert len(ds) == n
    batch = next(ds.batches(4))
    assert batch["node_feature"].shape == (4, 96, 2)
    np.testing.assert_allclose(batch["node_feature"][:, :, 0],
                               d["noizy_sg"].numpy()[:4], rtol=1e-6)
    np.testing.assert_array_equal(batch["label"], d["gts"].numpy()[:4])
    assert batch["nn_idx_f2v"].shape[-2:] == (96, 3)
