"""Pallas weight-only int8 matmul: parity with the XLA dequant expression.

The kernel exists because XLA hoists the loop-invariant dequant out of the
KV-cache decode scan and re-reads full-width weights every step (see
ops/quant_matmul.py). On CPU it runs in interpreter mode; the compiled path
is exercised on TPU by bench.py's int8 decode leg.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from runia_core_tpu.ops.quant_matmul import quant_matmul, quant_matmul_supported


def _ref(x, wq, s, dt):
    return (x.astype(dt) @ (wq.astype(dt) * s.astype(dt)[None, :])).astype(dt)


def _check(rng, shape_lead, k, n, dt):
    x = jnp.asarray(rng.standard_normal(shape_lead + (k,)), dt)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    s = jnp.asarray(rng.uniform(1e-3, 1e-2, (n,)), jnp.float32)
    rows = int(np.prod(shape_lead))
    assert quant_matmul_supported(rows, k, n)
    got = quant_matmul(x, wq, s, interpret=True)
    ref = _ref(x, wq, s, dt)
    assert got.shape == ref.shape
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    rel = np.max(np.abs(g - r)) / (np.max(np.abs(r)) + 1e-9)
    # bf16 dequant ordering differs (scale applied post-dot in f32, which is
    # the *more* accurate ordering); budget one bf16 ulp of relative error.
    assert rel < (8e-3 if dt == jnp.bfloat16 else 1e-5), rel


@pytest.fixture
def nprng():
    return np.random.default_rng(7)


class TestQuantMatmulParity:
    def test_decode_shape_bf16(self, nprng):
        _check(nprng, (16, 1), 2048, 512, jnp.bfloat16)

    def test_single_row_f32(self, nprng):
        _check(nprng, (1,), 256, 512, jnp.float32)

    def test_rows_not_tile_aligned(self, nprng):
        _check(nprng, (3,), 128, 256, jnp.float32)

    def test_speculative_verify_rows(self, nprng):
        # batch x (draft_len + 1) rows, ffn-ish N not divisible by 512
        _check(nprng, (16, 5), 256, 1280, jnp.bfloat16)

    def test_unsupported_shapes_refused(self):
        assert not quant_matmul_supported(2048, 2048, 5632)  # bulk prefill
        assert not quant_matmul_supported(16, 100, 512)  # ragged K
        assert not quant_matmul_supported(16, 2048, 100)  # ragged N
        # f32 512-row block blows the VMEM budget; the bf16 serving config
        # admits the same lane-chunk shape (x_bytes-aware check).
        assert not quant_matmul_supported(1024, 4096, 4096, 4)
        assert quant_matmul_supported(512, 4096, 4096, 2)

    def test_vmem_bound_shapes_refused(self):
        """The budget must count the RESIDENT x block, not just the weight
        stream: max rows x a huge K make the x block alone exceed VMEM,
        which used to pass the check and fail at Mosaic compile time."""
        assert not quant_matmul_supported(256, 24576, 4096)
        # same K with few rows fits (x block shrinks to ~1.5 MB)
        assert quant_matmul_supported(8, 24576, 4096)
        # same rows with a moderate K fits (x block ~2 MB)
        assert quant_matmul_supported(256, 2048, 4096)


class TestQDenseIntegration:
    def test_qdense_cpu_fallback_matches_manual(self, nprng):
        """On CPU QDense takes the XLA path; assert it equals the manual
        dequant so the two branches stay interchangeable."""
        from runia_core_tpu.models.llama import QDense

        import jax

        x = jnp.asarray(nprng.standard_normal((4, 128)), jnp.float32)
        mod = QDense(features=256, dtype=jnp.float32)
        params = mod.init(jax.random.key(0), x)
        wq = jnp.asarray(nprng.integers(-127, 128, (128, 256)), jnp.int8)
        s = jnp.asarray(nprng.uniform(1e-3, 1e-2, (256,)), jnp.float32)
        params = {"params": {"kernel_q": wq, "scale": s}}
        out = mod.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(x, wq, s, jnp.float32)), rtol=1e-6
        )
