"""flash_prefix_attention parity vs its XLA oracle (interpret mode on CPU).

The kernel's contract (per-row valid windows ``kv_start <= j <= q_start +
i``, GQA head grouping, optional KV8 dequant scales) is pinned against
``reference_prefix_attention`` — the dense-masked math the serving
engine's prefill previously ran. Real-TPU execution is exercised by the
engine bench legs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.ops.flash_prefill import (
    flash_prefix_attention,
    reference_prefix_attention,
)


def _rand_case(rng, b, hq, g, tq, kk, d, dtype=jnp.float32):
    q = jnp.asarray(rng.randn(b, hq, tq, d), dtype) * 0.3
    k = jnp.asarray(rng.randn(b, g, kk, d), dtype) * 0.3
    v = jnp.asarray(rng.randn(b, g, kk, d), dtype) * 0.5
    return q, k, v


@pytest.mark.parametrize("tq,kk,bq,bk", [
    (16, 64, 8, 16),     # several key blocks, several query blocks
    (8, 32, 8, 8),       # single query block
    (24, 64, 8, 32),     # query count not a power of two
])
def test_matches_reference_chunked(rng, tq, kk, bq, bk):
    b, hq, g, d = 2, 4, 2, 8
    q, k, v = _rand_case(rng, b, hq, g, tq, kk, d)
    # Chunked-prefill shape: queries start mid-cache, kv_start = 0.
    q_start = jnp.asarray([0, 24], jnp.int32)
    out = flash_prefix_attention(
        q, k, v, q_start, block_q=bq, block_k=bk, interpret=True
    )
    ref = reference_prefix_attention(q, k, v, q_start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_matches_reference_left_pad(rng):
    """Bucketed-prefill shape: kv_start > 0 left-pad offsets; rows before
    their own kv_start have an EMPTY window and must come back zero."""
    b, hq, g, tq, kk, d = 2, 2, 1, 16, 32, 8
    q, k, v = _rand_case(rng, b, hq, g, tq, kk, d)
    q_start = jnp.zeros((b,), jnp.int32)
    kv_start = jnp.asarray([5, 0], jnp.int32)
    out = flash_prefix_attention(
        q, k, v, q_start, kv_start, block_q=8, block_k=8, interpret=True
    )
    ref = reference_prefix_attention(q, k, v, q_start, kv_start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # Row 0..4 of batch 0 attend nothing -> zeros (no NaN).
    assert np.all(np.asarray(out)[0, :, :5, :] == 0.0)


def test_matches_reference_kv8(rng):
    """Int8 cache with per-key dequant scales: the kernel applies the
    k-scale on the logits and the v-scale on the probabilities, matching
    the model's O(K) restructured dequant (models/llama.py:174-203)."""
    b, hq, g, tq, kk, d = 1, 4, 2, 16, 32, 8
    q, _, _ = _rand_case(rng, b, hq, g, tq, kk, d)
    k8 = jnp.asarray(rng.randint(-127, 128, (b, g, kk, d)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (b, g, kk, d)), jnp.int8)
    k_scale = jnp.asarray(0.01 + 0.02 * rng.rand(b, kk, g), jnp.float32)
    v_scale = jnp.asarray(0.01 + 0.02 * rng.rand(b, kk, g), jnp.float32)
    q_start = jnp.asarray([8], jnp.int32)
    out = flash_prefix_attention(
        q, k8, v8, q_start, None, k_scale, v_scale,
        block_q=8, block_k=8, interpret=True,
    )
    ref = reference_prefix_attention(
        q, k8, v8, q_start, None, k_scale=k_scale, v_scale=v_scale
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_block_skip_ignores_garbage_tail(rng):
    """Cache rows past the valid window carry garbage (the engine's
    row-ownership invariant); poisoning them with NaN must not leak —
    the skipped blocks are never read into the accumulation."""
    b, hq, g, tq, kk, d = 1, 2, 2, 8, 64, 8
    q, k, v = _rand_case(rng, b, hq, g, tq, kk, d)
    q_start = jnp.asarray([4], jnp.int32)  # valid keys end at 4+8-1=11
    poison = jnp.where(
        jnp.arange(kk)[None, None, :, None] >= 16, jnp.nan, 0.0
    )
    out = flash_prefix_attention(
        q, k + poison, v + poison, q_start,
        block_q=8, block_k=16, interpret=True,
    )
    ref = reference_prefix_attention(q, k, v, q_start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gqa_grouping(rng):
    """Query head h must read kv group h // rep — checked by making the
    groups wildly different."""
    b, hq, g, tq, kk, d = 1, 4, 2, 8, 16, 8
    q, k, v = _rand_case(rng, b, hq, g, tq, kk, d)
    v = v.at[:, 1].set(v[:, 1] + 100.0)  # group 1 offset
    out = flash_prefix_attention(
        q, k, v, jnp.asarray([8], jnp.int32),
        block_q=8, block_k=8, interpret=True,
    )
    o = np.asarray(out)
    assert o[0, 0].mean() < 50 and o[0, 1].mean() < 50
    assert o[0, 2].mean() > 50 and o[0, 3].mean() > 50
