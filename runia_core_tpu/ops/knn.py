"""Brute-force k-nearest-neighbor search on TPU (replaces faiss IndexFlatL2).

The reference delegates kNN to the faiss C++ index and loops per test sample
(runia_core/inference/postprocessors.py:396-398,415-423,850-854,872-883).
Here the whole search is one XLA program: a matmul-based squared-distance
matrix (MXU) followed by ``jax.lax.top_k`` on negated distances. faiss's
IndexFlatL2 reports *squared* L2 distances, which we preserve.

For train banks sharded across a device mesh, ``sharded_kth_neighbor`` computes
local top-k per shard and merges with an all-gather of k candidates — the
collective rides ICI inside the jitted program (SURVEY.md section 2.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "squared_l2_distances",
    "squared_l2_kth_neighbor",
    "knn_search",
    "sharded_kth_neighbor",
]


def squared_l2_distances(test: jnp.ndarray, train: jnp.ndarray) -> jnp.ndarray:
    """(N_test, N_train) squared euclidean distances via one matmul."""
    x_sq = jnp.sum(test * test, axis=1, keepdims=True)
    t_sq = jnp.sum(train * train, axis=1)
    cross = jnp.matmul(test, train.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x_sq - 2.0 * cross + t_sq[None, :], 0.0)


@partial(jax.jit, static_argnames=("k", "row_chunk"))
def knn_search(test: jnp.ndarray, train: jnp.ndarray, k: int, row_chunk: int = 1024):
    """Top-k nearest neighbors: (squared distances (N, k) ascending, indices).

    Memory-bounded by chunking test rows through ``lax.map`` so the distance
    matrix never exceeds (row_chunk, N_train).
    """
    n_test = test.shape[0]
    pad = (-n_test) % row_chunk
    test_padded = jnp.pad(test, ((0, pad), (0, 0)))
    chunks = test_padded.reshape(-1, row_chunk, test.shape[1])

    def one_chunk(chunk):
        dists = squared_l2_distances(chunk, train)
        neg_top, idx = jax.lax.top_k(-dists, k)
        return -neg_top, idx

    dists, idx = jax.lax.map(one_chunk, chunks)
    dists = dists.reshape(-1, k)[:n_test]
    idx = idx.reshape(-1, k)[:n_test]
    return dists, idx


def squared_l2_kth_neighbor(
    test: jnp.ndarray, train: jnp.ndarray, k: int, row_chunk: int = 1024
) -> jnp.ndarray:
    """Squared distance to the k-th nearest neighbor (1-indexed), per test row."""
    dists, _ = knn_search(test, train, k, row_chunk=row_chunk)
    return dists[:, -1]


def sharded_kth_neighbor(
    test: jnp.ndarray, train_shard: jnp.ndarray, k: int, axis_name: str
) -> jnp.ndarray:
    """k-th NN over a train bank sharded along ``axis_name``.

    Use inside ``shard_map``: each device searches its local shard for the
    k best candidates, then an all-gather of the (N, k) candidate lists and a
    final top-k merge yields the global result. Communication is O(N * k)
    instead of O(N * N_train).
    """
    local_dists, _ = jax.lax.top_k(-squared_l2_distances(test, train_shard), k)
    gathered = jax.lax.all_gather(local_dists, axis_name, axis=1)  # (N, S, k)
    merged, _ = jax.lax.top_k(gathered.reshape(test.shape[0], -1), k)
    return -merged[:, -1]
