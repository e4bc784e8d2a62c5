"""Pallas TPU kernel: fused 3x3-NMS + threshold + top-K peak extraction.

The first stage of on-device decode (infer/decode.py:_topk_logit_peaks,
reference semantics img2smiles2.py:61-67) is a 3x3 max-pool NMS over a
(B, G, G) heatmap followed by top-K selection of surviving cells. The
XLA path materializes the pooled map, a mask, a masked score map, and
then runs a sort-based lax.top_k over all G*G cells per image. This
kernel fuses the whole reduction in VMEM: one pass builds the
neighbor-max via shifted compares, and an iterative K-step
select-and-suppress loop emits scores+indices directly — the masked
score map never reaches HBM and nothing is sorted.

Mosaic tiling: blocks are 8 images per program — (8, G, G) input and
(8, K) output tiles satisfy the (sublane 8, lane 128) f32 tiling rule
(a (1, K) output block does not); the wrapper pads the batch dim to a
multiple of 8 with -inf maps and slices the padding off.

Parity contract (tested in tests/test_pallas_peaks.py against the XLA
path, interpret mode):
  * NMS keeps cells equal to their 3x3-neighborhood max (plateau ties
    all survive, as the reference's ``==`` compare does);
  * cells with logit <= threshold are dropped;
  * results are sorted by score descending, ties broken by flat index
    ascending (lax.top_k's stable order);
  * invalid slots carry score -inf. Indices are only defined for
    finite-score slots: exhausted slots repeat index 0, where lax.top_k
    emits distinct ascending indices. Downstream masks on
    isfinite(score), so only the finite slots are part of the parity
    contract (and of the tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_B = 8   # images per program (f32 sublane tile)


def _shifted_neighbor_max(x: jnp.ndarray) -> jnp.ndarray:
    """Max over the 8 neighbors + self with SAME (-inf) edge handling,
    equivalent to reduce_window(3x3, SAME) over each (G, G) map of a
    (B, G, G) block."""
    b, g0, g1 = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (b, g0, g1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, g0, g1), 2)
    neg = jnp.float32(-jnp.inf)
    m = x
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            # Per-axis pltpu.roll: Mosaic rejects jnp.roll's
            # concat/slice lowering on these tiles.
            shifted = x
            if dr:
                shifted = pltpu.roll(shifted, dr % g0, 1)
            if dc:
                shifted = pltpu.roll(shifted, dc % g1, 2)
            ok = jnp.ones((b, g0, g1), jnp.bool_)
            if dr == 1:
                ok &= row > 0
            elif dr == -1:
                ok &= row < g0 - 1
            if dc == 1:
                ok &= col > 0
            elif dc == -1:
                ok &= col < g1 - 1
            m = jnp.maximum(m, jnp.where(ok, shifted, neg))
    return m


def _nms_topk_kernel(x_ref, scores_ref, idx_ref, *, k: int,
                     threshold: float):
    # The whole (BLOCK_B, G, G) block is processed at once: the K-step
    # select-and-suppress loop reduces over axis 1 of a (BLOCK_B, G*G)
    # tile, so all 8 images share each pass's VPU work. (The round-2
    # version unrolled a per-image loop — 8x K full-map reductions,
    # which is why it lost its A/B by 8% against XLA's sort-based
    # top_k; see logs/profile_ab_r2.log.)
    x = x_ref[...]                                 # (B, G, G) f32
    b, g0, g1 = x.shape
    pooled = _shifted_neighbor_max(x)
    keep = (pooled == x) & (x > threshold)
    flat = jnp.where(keep, x, -jnp.inf).reshape(b, g0 * g1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, g0 * g1), 1)
    cols_k = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def body(i, carry):
        flat, svec, ivec = carry
        # First-occurrence argmax == lax.top_k's stable tie order.
        best = jnp.max(flat, axis=1, keepdims=True)           # (B, 1)
        bidx = jnp.argmax(flat, axis=1).astype(jnp.int32)
        bidx = bidx.reshape(b, 1)                             # (B, 1)
        svec = jnp.where(cols_k == i, best, svec)
        ivec = jnp.where(cols_k == i, bidx, ivec)
        flat = jnp.where(cols == bidx, -jnp.inf, flat)
        return flat, svec, ivec

    _, svec, ivec = jax.lax.fori_loop(
        0, k, body,
        (flat, jnp.full((b, k), -jnp.inf, jnp.float32),
         jnp.zeros((b, k), jnp.int32)))
    scores_ref[...] = svec
    idx_ref[...] = ivec


def nms_topk(logit: jnp.ndarray, k: int, threshold: float,
             interpret: bool = None):
    """logit: (B, G, G) f32. Returns (scores (B,k) f32, flat_idx (B,k)
    i32) — drop-in for the pooled/masked lax.top_k pair in
    infer/decode.py:_topk_logit_peaks. interpret=None auto-selects
    interpreter mode off-TPU (CPU test environment)."""
    if interpret is None:
        # axon = TPU behind the experimental tunnel (still Mosaic-lowered)
        interpret = jax.default_backend() not in ("tpu", "axon")
    b = logit.shape[0]
    b_pad = -(-b // _BLOCK_B) * _BLOCK_B
    scores, idx = _nms_topk(logit, b_pad, k, threshold, interpret)
    return scores[:b], idx[:b]


@functools.partial(jax.jit,
                   static_argnames=("b_pad", "k", "threshold", "interpret"))
def _nms_topk(logit: jnp.ndarray, b_pad: int, k: int, threshold: float,
              interpret: bool):
    b, g0, g1 = logit.shape
    if b_pad != b:
        pad = jnp.full((b_pad - b, g0, g1), -jnp.inf, jnp.float32)
        logit = jnp.concatenate([logit.astype(jnp.float32), pad], axis=0)
    kernel = functools.partial(_nms_topk_kernel, k=k, threshold=threshold)
    scores, idx = pl.pallas_call(
        kernel,
        grid=(b_pad // _BLOCK_B,),
        in_specs=[pl.BlockSpec((_BLOCK_B, g0, g1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((_BLOCK_B, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_B, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ),
        interpret=interpret,
    )(logit.astype(jnp.float32))
    return scores, idx
