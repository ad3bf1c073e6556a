"""LDPC data layer tests: asset parsing, encode/channel, BP decoders
(numpy vs C++ vs batched JAX), structure builders, datasets."""

import numpy as np
import pytest

from fgnn_tpu.data import (
    BPGraph,
    ContinuousCodesSP,
    bp_decode,
    channel,
    decode_graph,
    default_paths,
    default_structure,
    encode,
    gen_sample,
    ldpc_cpp,
    posteriors,
    read_alist,
    read_mod2mat,
    sample_to_features,
)


def test_read_alist_963():
    a = read_alist(default_paths()["alist"])
    assert (a.N, a.M) == (96, 48)
    assert a.max_col_deg == 3 and a.max_row_deg == 6
    assert all(len(c) == 3 for c in a.col_items)
    assert all(len(r) == 6 for r in a.row_items)
    # row/col lists must be consistent
    for n, rows in enumerate(a.col_items):
        for m in rows:
            assert n in a.row_items[m]


def test_read_alist_a2():
    a = read_alist(default_paths()["A2"])
    assert (a.N, a.M) == (96, 48)
    assert a.max_col_deg == 4 and a.max_row_deg == 7


def test_read_generator_matrix():
    G = read_mod2mat(default_paths()["G"])
    assert G.shape == (48, 48)
    assert set(np.unique(G)).issubset({0, 1})
    assert G.sum() > 0


def test_encode_produces_valid_codewords():
    """[s ; t] must satisfy the A2 parity check: A @ x = 0 (mod 2)."""
    rng = np.random.RandomState(0)
    A2 = read_alist(default_paths()["A2"])
    H = A2.to_dense()
    for _ in range(5):
        s = rng.randint(0, 2, 48)
        cw = encode(s, 48, 48)
        assert cw.shape == (96,)
        assert np.array_equal(cw[:48], s)
        assert np.all((H @ cw) % 2 == 0), "encoded word fails parity check"


def test_channel_statistics():
    rng = np.random.RandomState(1)
    t = np.zeros(200000, np.int64)
    y = channel(t, snr_db=0.0, sigma_b=0.0, rng=rng)
    # BPSK 0 -> -gcx = -1 at snr 0, unit noise
    assert abs(y.mean() + 1.0) < 0.02
    assert abs(y.std() - 1.0) < 0.02
    yb = channel(t, snr_db=0.0, sigma_b=5.0, burst_prob=0.05, rng=rng)
    assert yb.std() > y.std()  # bursts add variance


def test_bp_decoder_noiseless():
    """At very high SNR the decoder must recover every codeword."""
    rng = np.random.RandomState(2)
    g = decode_graph()
    for _ in range(5):
        s = rng.randint(0, 2, 48)
        cw = encode(s, 48, 48)
        y = channel(cw, snr_db=10.0, sigma_b=0.0, rng=rng)
        bias = posteriors(y, 10.0)
        x, ok, its, _ = bp_decode(g, bias, max_loops=100)
        assert ok and its <= 5
        assert np.array_equal(x[:48], s)


@pytest.mark.skipif(not ldpc_cpp.available(), reason="no C++ toolchain")
def test_cpp_decoder_matches_numpy():
    rng = np.random.RandomState(3)
    g = decode_graph()
    biases, xs_np = [], []
    for _ in range(8):
        s = rng.randint(0, 2, 48)
        cw = encode(s, 48, 48)
        y = channel(cw, snr_db=1.0, sigma_b=2.0, rng=rng)
        bias = posteriors(y, 1.0)
        biases.append(bias)
        x, ok, its, _ = bp_decode(g, bias, max_loops=50)
        xs_np.append((x, ok, its))
    x_c, ok_c, its_c = ldpc_cpp.bp_decode_batch(g, np.stack(biases), max_loops=50)
    for b in range(8):
        assert np.array_equal(x_c[b], xs_np[b][0]), f"word {b} differs"
        assert ok_c[b] == xs_np[b][1]
        assert its_c[b] == xs_np[b][2]


def test_jax_decoder_matches_numpy():
    from fgnn_tpu.ops.bp import BPGraphArrays, bp_decode_batch

    rng = np.random.RandomState(4)
    g = decode_graph()
    ga = BPGraphArrays.from_ref(g)
    biases, refs = [], []
    for _ in range(6):
        s = rng.randint(0, 2, 48)
        cw = encode(s, 48, 48)
        y = channel(cw, snr_db=1.0, sigma_b=1.0, rng=rng)
        bias = posteriors(y, 1.0)
        biases.append(bias)
        refs.append(bp_decode(g, bias, max_loops=30))
    x_j, ok_j, its_j = bp_decode_batch(ga, np.stack(biases).astype(np.float32),
                                       max_loops=30)
    x_j = np.asarray(x_j)
    agree = sum(np.array_equal(x_j[b], refs[b][0]) for b in range(6))
    # f32 vs f64 may flip borderline bits on undecodable words; demand
    # agreement on all words that BOTH decoders solved.
    for b in range(6):
        if refs[b][1] and bool(np.asarray(ok_j)[b]):
            assert np.array_equal(x_j[b], refs[b][0]), f"word {b} differs"
    assert agree >= 4


def test_bipartite_structure():
    st = default_structure()
    y = np.arange(96, dtype=np.float64)
    hop, nn_f2v, nn_v2f, ef_f2v, ef_v2f = st.bipartite_features(y)
    assert hop.shape == (48, 6)
    assert nn_f2v.shape == (96, 3) and nn_v2f.shape == (48, 6)
    assert ef_f2v.shape == (96, 3, 7) and ef_v2f.shape == (48, 6, 7)
    # last channel of f2v features is the variable's own signal
    np.testing.assert_allclose(ef_f2v[:, :, 6], np.repeat(y[:, None], 3, 1))
    # hop rows are the member variables' signals
    np.testing.assert_allclose(hop, y[st.factors])
    # v2f last channel is the member's signal (i.e. hop itself)
    np.testing.assert_allclose(ef_v2f[:, :, 6], hop)


def test_joint_structure():
    st = default_structure()
    y = np.random.RandomState(5).randn(96)
    nn_idx, etype, efeature, hop = st.joint_features(y)
    assert nn_idx.shape == (144, 6)
    assert etype.shape == (144, 6, 2)
    assert efeature.shape == (144, 6, 7)
    # var rows: first 3 slots point at factor nodes (>= 96), rest self-padded
    assert np.all(nn_idx[:96, :3] >= 96)
    assert np.all(nn_idx[:96, 3:] == np.arange(96)[:, None])
    # factor rows point at variables
    assert np.all(nn_idx[96:, :] < 96)


def test_continuous_codes_sp_batches():
    ds = ContinuousCodesSP(length=8, seed=0)
    batch = next(ds.batches(4))
    assert batch["node_feature"].shape == (4, 96, 2)
    assert batch["hop_feature"].shape == (4, 48, 6)
    assert batch["efeature_f2v"].shape == (4, 96, 3, 7)
    assert batch["efeature_v2f"].shape == (4, 48, 6, 7)
    assert batch["label"].shape == (4, 96)
    # node feature channel 1 is the snr
    assert np.all(np.isin(batch["node_feature"][:, :, 1], [0, 1, 2, 3, 4]))


def test_gen_sample_with_bp_error():
    y, cw, err = gen_sample(4.0, 0.0, rng=np.random.RandomState(6),
                            with_bp_error=True)
    assert 0.0 <= err <= 1.0
    assert err < 0.1  # snr 4 decodes cleanly


def test_continuous_codes_joint_batches():
    """Joint-graph on-the-fly dataset (ContinusCodes equivalent,
    reference ldpc_dataset.py:159-206)."""
    from fgnn_tpu.data import ContinuousCodesJoint

    ds = ContinuousCodesJoint(length=8, seed=0)
    b = next(ds.batches(4))
    assert b["node_feature"].shape == (4, 96, 2)
    assert b["hop_feature"].shape == (4, 48, 6)
    assert b["nn_idx"].shape == (4, 144, 6)
    assert b["etype"].shape == (4, 144, 6, 2)
    assert b["efeature"].shape == (4, 144, 6, 7)
    assert b["label"].shape == (4, 96)
    assert set(np.unique(b["label"])) <= {0, 1}


def test_batch_to_features_matches_per_sample():
    """Vectorized feature build == stacked per-sample sample_to_features,
    and the vectorized ContinuousCodesSP.batches stream is unchanged
    (same RNG order as per-sample .sample())."""
    from fgnn_tpu.data import ContinuousCodesSP
    from fgnn_tpu.data.ldpc_datasets import (
        _stack,
        batch_to_features,
        sample_to_features,
    )

    rng = np.random.RandomState(42)
    ys = rng.randn(5, 96).astype(np.float32)
    snrs = np.asarray([0, 1, 2, 3, 4], np.float32)
    batched = batch_to_features(ys, snrs)
    stacked = _stack([sample_to_features(ys[i], float(snrs[i]))
                      for i in range(5)])
    assert set(batched) == set(stacked)
    for k in stacked:
        np.testing.assert_array_equal(batched[k], stacked[k], err_msg=k)

    a = next(ContinuousCodesSP(length=4, seed=7).batches(4))
    ref_ds = ContinuousCodesSP(length=4, seed=7)
    b = _stack([ref_ds.sample() for _ in range(4)])
    for k in b:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
