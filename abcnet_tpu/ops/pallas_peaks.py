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

Parity contract (tested in tests/test_pallas_peaks.py against the XLA
path, interpret mode):
  * NMS keeps cells equal to their 3x3-neighborhood max (plateau ties
    all survive, as the reference's ``==`` compare does);
  * cells with logit <= threshold are dropped;
  * results are sorted by score descending, ties broken by flat index
    ascending (lax.top_k's stable order);
  * invalid slots carry score -inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted_neighbor_max(x: jnp.ndarray) -> jnp.ndarray:
    """Max over the 8 neighbors + self with SAME (-inf) edge handling,
    equivalent to reduce_window(3x3, SAME) over one (G, G) map."""
    g0, g1 = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (g0, g1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g0, g1), 1)
    neg = jnp.float32(-jnp.inf)
    m = x
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            shifted = jnp.roll(x, (dr, dc), axis=(0, 1))
            ok = jnp.ones((g0, g1), jnp.bool_)
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
    x = x_ref[0]                                   # (G, G) f32
    g0, g1 = x.shape
    pooled = _shifted_neighbor_max(x)
    keep = (pooled == x) & (x > threshold)
    flat = jnp.where(keep, x, -jnp.inf).reshape(1, g0 * g1)

    def body(i, flat):
        # First-occurrence argmax == lax.top_k's stable tie order.
        best = jnp.max(flat)
        bidx = jnp.argmax(flat, axis=1)[0].astype(jnp.int32)
        scores_ref[0, i] = best
        idx_ref[0, i] = bidx
        cols = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
        return jnp.where(cols == bidx, -jnp.inf, flat)

    jax.lax.fori_loop(0, k, body, flat)


def nms_topk(logit: jnp.ndarray, k: int, threshold: float,
             interpret: bool = None):
    """logit: (B, G, G) f32. Returns (scores (B,k) f32, flat_idx (B,k)
    i32) — drop-in for the pooled/masked lax.top_k pair in
    infer/decode.py:_topk_logit_peaks. interpret=None auto-selects
    interpreter mode off-TPU (CPU test environment)."""
    if interpret is None:
        # axon = TPU behind the experimental tunnel (still Mosaic-lowered)
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _nms_topk(logit, k, threshold, interpret)


@functools.partial(jax.jit, static_argnames=("k", "threshold", "interpret"))
def _nms_topk(logit: jnp.ndarray, k: int, threshold: float,
              interpret: bool):
    b, g0, g1 = logit.shape
    kernel = functools.partial(_nms_topk_kernel, k=k, threshold=threshold)
    scores, idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, g0, g1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        interpret=interpret,
    )(logit.astype(jnp.float32))
    return scores, idx
