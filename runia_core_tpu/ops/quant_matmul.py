"""Weight-only int8 matmul that actually reads int8 from HBM.

Why this kernel exists: the XLA expression of weight-only int8 —
``x @ (wq.astype(bf16) * scale)`` — is loop-invariant in a KV-cache decode
scan, so XLA hoists the dequantized full-width weight out of the
``lax.while`` body and threads it through the loop carry (verified on the
optimized HLO: the convert+multiply fusion runs once, and every decode step
reads the bf16 buffer). Per-step HBM traffic is then identical to a bf16
model, which is exactly the traffic int8 weights were meant to halve —
KV-cached decode is weight-bandwidth-bound (reference HF ``generate`` has no
such notion at all; its decode re-reads fp16/fp32 torch weights,
runia_core/llm_uncertainty/scores.py:439-456).

A ``pallas_call`` is opaque to loop-invariant code motion: its operands are
the int8 kernel and the per-channel scale, so each decode step DMAs the int8
bytes into VMEM, dequantizes tile-by-tile on the VPU, and feeds the MXU.
Numerics match the XLA dequant path (same convert→multiply in the same
dtype) within reduction-order noise.

Kernel shape contract (matches `models/llama.py::QDense` storage):
  x     (rows, K)  bf16/f32   activations (decode: rows = batch, tiny)
  wq    (K, N)     int8       per-output-channel symmetric weights
  scale (N,)       f32        dequant scale per output channel
  out   (rows, N)  x.dtype
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quant_matmul", "quant_matmul_supported"]

# The resident x block, the double-buffered int8 weight stream, and the
# output block must together fit VMEM (~16 MB physical; budget leaves
# headroom for scales, semaphores, and compiler scratch).
_VMEM_BUDGET = 10 * 1024 * 1024

# Keep the Pallas path for the small-to-medium-row regime (decode,
# speculative verify, lane-batched chunked prefill — a (4, 128) lane chunk
# is 512 rows). Truly large-row prefill is MXU-bound and the one-off XLA
# dequant amortizes over thousands of rows, so the plain path stays optimal
# there — and keeping rows in one VMEM-resident block keeps this kernel a
# single-level pipeline over N. The VMEM fit check is authoritative; this
# cap just bounds the resident block's sublane extent.
_MAX_ROWS = 1024


def _kernel(x_ref, wq_ref, s_ref, o_ref):
    w = wq_ref[:].astype(x_ref.dtype)  # int8 -> compute dtype, in VMEM
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _padded_rows(rows: int, x_dtype) -> int:
    sub = 16 if x_dtype == jnp.bfloat16 else 8
    return ((rows + sub - 1) // sub) * sub


def _pick_block_n(n: int, k: int, rows_p: int, x_bytes: int) -> int:
    """Largest block_n whose FULL VMEM working set fits the budget: the
    resident (rows_p, K) x block, two in-flight (K, block_n) int8 weight
    blocks (double-buffered stream), and the (rows_p, block_n) f32
    accumulator/output. Counting only the weight block (the original
    formula) admitted shapes whose real footprint blew the ~16 MB VMEM and
    failed at Mosaic compile time with no fallback."""
    x_cost = rows_p * k * x_bytes
    for bn in (512, 256, 128):
        if n % bn != 0:
            continue
        weight_stream = 2 * k * bn          # int8, double-buffered
        out_block = rows_p * bn * 4          # f32 accumulator
        if x_cost + weight_stream + out_block <= _VMEM_BUDGET:
            return bn
    return 0


def quant_matmul_supported(rows: int, k: int, n: int,
                           x_bytes: int = 4) -> bool:
    """True if (rows, K) @ (K, N) fits this kernel's shape contract.

    ``x_bytes`` is the activation itemsize (2 for the bf16 serving
    config); the default costs the x block at its f32 worst case, so
    callers that don't know their dtype get a conservative answer while
    bf16 callers can admit the medium-row prefill shapes that matter
    (e.g. a 512-row lane chunk against a 7B-class K=4096)."""
    rows_p = ((rows + 15) // 16) * 16
    return (
        rows <= _MAX_ROWS
        and k % 128 == 0
        and _pick_block_n(n, k, rows_p, x_bytes) != 0
    )


@partial(jax.jit, static_argnames=("interpret",))
def quant_matmul(x, wq, scale, *, interpret: bool = False):
    """``x @ (wq * scale[None, :])`` with wq kept int8 in HBM.

    ``x`` may carry leading batch dims; they are flattened to rows. Falls
    back is the caller's job (see ``quant_matmul_supported``) — this
    function asserts the contract.
    """
    *lead, k = x.shape
    rows = 1
    for d in lead:
        rows *= d
    n = wq.shape[1]
    assert wq.shape[0] == k and scale.shape == (n,), (x.shape, wq.shape, scale.shape)
    # Pad rows to the sublane tile so the MXU feed is aligned.
    rows_p = _padded_rows(rows, x.dtype)
    block_n = _pick_block_n(n, k, rows_p, x.dtype.itemsize)
    assert rows <= _MAX_ROWS and k % 128 == 0 and block_n, (rows, k, n)

    x2 = x.reshape(rows, k)
    if rows_p != rows:
        x2 = jnp.pad(x2, ((0, rows_p - rows), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((rows_p, k), lambda j: (0, 0)),  # resident
            pl.BlockSpec((k, block_n), lambda j: (0, j)),  # streamed
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((rows_p, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((rows_p, n), x.dtype),
        interpret=interpret,
    )(x2, wq, scale.reshape(1, n))
    return out[:rows].reshape(*lead, n)
