"""Retrieval / kNN shape-graph unit tests (mean-of-max cosine semantics vs a
numpy reference, self-exclusion, random pairs, KMeans candidate pruning)."""

import numpy as np
import pytest

from csn_tpu.retrieval.graph import (
    kmeans_candidate_indices, knn_graph_from_measure, knn_graph_topk_rows,
    random_pairs, retrieval_measure,
)


def numpy_mean_of_max_cosine(f1, m1, f2, m2):
    """Reference math (`MinkowskiNet/models/hrnet.py:472-490`)."""
    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True),
                              1e-12)

    out = np.zeros((f1.shape[0], f2.shape[0]))
    for i in range(f1.shape[0]):
        a = norm(f1[i][m1[i]])
        for j in range(f2.shape[0]):
            b = norm(f2[j][m2[j]])
            sim = a @ b.T
            out[i, j] = sim.max(axis=1).mean()
    return out


def test_retrieval_measure_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(5, 14, 6)).astype(np.float32)
    k = rng.normal(size=(7, 14, 6)).astype(np.float32)
    qm = rng.random((5, 14)) < 0.8
    km = rng.random((7, 14)) < 0.8
    qm[:, 0] = km[:, 0] = True  # at least one valid point per shape
    got = retrieval_measure(q, qm, k, km, query_block=2, key_chunk=3)
    ref = numpy_mean_of_max_cosine(q, qm, k, km)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_retrieval_measure_streams_key_blocks():
    """Big-category memory safety: keys are streamed in bounded device
    blocks (Table-scale key sets exceed one chip's HBM — the reference
    caches key features on CPU for the same reason,
    `lib/csn_utils.py:66-83`). A tiny byte budget must force multiple key
    blocks and still reproduce the one-shot measure exactly."""
    from csn_tpu.retrieval.graph import _key_block_size

    rng = np.random.default_rng(3)
    nq, nk, P, d = 9, 23, 14, 6
    q = rng.normal(size=(nq, P, d)).astype(np.float32)
    k = rng.normal(size=(nk, P, d)).astype(np.float32)
    qm = rng.random((nq, P)) < 0.8
    km = rng.random((nk, P)) < 0.8
    qm[:, 0] = km[:, 0] = True

    per_key = P * d * 4
    budget = 5 * per_key  # key block of ~5 shapes -> >= 4 streamed blocks
    kb = _key_block_size(k, key_chunk=3, budget=budget)
    assert kb < nk and kb % 3 == 0
    got = retrieval_measure(q, qm, k, km, query_block=4, key_chunk=3,
                            key_bytes_budget=budget)
    ref = numpy_mean_of_max_cosine(q, qm, k, km)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # default budget bounds the device block for category-scale key sets
    # (broadcast view: Table-scale shape without allocating 16 GB)
    big = np.broadcast_to(np.zeros(1, np.float16), (5707, 5632, 256))
    assert _key_block_size(big, 8, 2 << 30) * 5632 * 256 * 2 <= (2 << 30) + \
        8 * 5632 * 256 * 2


def test_knn_graph_self_exclusion_and_topk():
    m = np.array([[1.0, 0.9, 0.8, 0.1],
                  [0.5, 1.0, 0.7, 0.9],
                  [0.3, 0.2, 1.0, 0.4],
                  [0.6, 0.9, 0.2, 1.0]])
    g = knn_graph_from_measure(m, K=2, is_same=True)
    for idx, nbrs in g:
        assert idx not in nbrs and len(nbrs) == 2
    assert g[0][1] == [1, 2]   # highest non-self scores
    assert g[3][1] == [1, 0]

    rows = knn_graph_topk_rows(m, K=2)   # MID-FC style: includes self
    assert rows.shape == (4, 3)
    assert rows[0][0] == 0  # self is the top match of a similarity matrix


def test_random_pairs_distinct_and_self_excluded():
    rng = np.random.default_rng(1)
    g = random_pairs(10, 10, K=3, is_same=True, rng=rng)
    for idx, nbrs in g:
        assert idx not in nbrs
        assert len(set(nbrs)) == 3
    g2 = random_pairs(4, 100, K=2, is_same=False, rng=rng)
    assert all(len(n) == 2 for _, n in g2)


def test_kmeans_candidates_are_dataset_indices():
    rng = np.random.default_rng(2)
    feats = np.concatenate([
        rng.normal(loc=0.0, size=(30, 8)),
        rng.normal(loc=10.0, size=(30, 8)),
    ]).astype(np.float32)
    idx = kmeans_candidate_indices(feats, n_centers=2)
    assert len(idx) == 2
    assert set(idx) <= set(range(60))
    # one candidate from each cluster
    assert (idx < 30).sum() == 1 and (idx >= 30).sum() == 1


def test_midfc_full_attention_mode():
    """chunk_size=None: full attention instead of the reference's 20x500
    block-diagonal chunks (the TPU-friendly upgrade path)."""
    import jax
    import jax.numpy as jnp

    from csn_tpu.midfc.model import CrossShapeAt

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 40, 16)).astype(np.float32))
    m_full = CrossShapeAt(num_classes=5, d_model=16, n_heads=2, d_k=16,
                          d_v=16, attention_type="ssa", after_fc=True,
                          chunk_size=None)
    m_chunk = CrossShapeAt(num_classes=5, d_model=16, n_heads=2, d_k=16,
                           d_v=16, attention_type="ssa", after_fc=True,
                           chunk_size=20)
    v = m_full.init(jax.random.PRNGKey(0), x, train=False)
    out_full = m_full.apply(v, x, train=False)
    out_chunk = m_chunk.apply(v, x, train=False)
    assert out_full.shape == (2, 40, 5)
    # different attention topology -> different outputs (same params)
    assert not np.allclose(np.asarray(out_full), np.asarray(out_chunk))
