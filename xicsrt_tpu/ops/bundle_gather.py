"""Interval-indexed bundle-attribute gather (Pallas TPU kernel).

Plasma sources assign every ray to the bundle whose cumulative-count
interval contains the ray index, then read ~8 per-bundle attributes
(origin, spread, temperature, velocity — ``sources/plasma.py``;
cf. the reference's per-bundle Python loop
``_XicsrtPlasmaGeneric.py:286-345``). Neither formulation of that lookup
is TPU-friendly at the XLA level:

- ``table[searchsorted(cum, idx)]`` — TPU gathers cost ~55 ns/element
  (measured: 300 ms of a 390 ms generate at N = 5.6e6);
- interval-one-hot matmul in XLA — the (N, B) one-hot is a materialized
  HBM buffer (matmul operands cannot stay fused), ~N*B*4 bytes of
  round-trip traffic (measured 36 ms at N = 5.6e6, B = 1000).

This kernel does the one-hot contraction with the one-hot tile living
only in VMEM/registers: per (8, sub) chunk of ray indices it builds the
(B, sub) interval one-hot against the cumulative counts and contracts the
(8, B) attribute table on the MXU. HBM traffic is just indices in and
attributes out. Results are bit-identical to the indexed gather (a one-hot
row selects exactly one f32 table row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("n", "chunk", "interpret"))
def interval_gather(
    cum: jax.Array,
    table: jax.Array,
    n: int,
    chunk: int = 8192,
    interpret: bool = False,
) -> jax.Array:
    """attrs[r] = table[b(r)] with b(r) the interval of ``cum`` holding r.

    ``cum``: (B,) int32 inclusive cumulative counts (ray r belongs to
    bundle b iff cum[b-1] <= r < cum[b]). ``table``: (B, K) f32 attributes,
    K <= 8. Returns (n, K) f32; rays at or beyond cum[-1] get all-zero rows.
    """
    B, K = table.shape
    if K > 8:
        raise ValueError("interval_gather supports at most 8 attributes")
    B_pad = _round_up(max(B, 128), 128)
    # Padded bundles get the empty interval [0, 0) — never matched.
    # cum arrays are laid out (B_pad, 1) — bundles on SUBLANES — so the
    # kernel broadcasts them against lane-major ray indices without a
    # relayout.
    cum_prev = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
    cum_p = jnp.zeros((B_pad, 1), jnp.int32).at[:B, 0].set(cum)
    cum_prev_p = jnp.zeros((B_pad, 1), jnp.int32).at[:B, 0].set(cum_prev)
    table_p = jnp.zeros((8, B_pad), jnp.float32).at[:K, :B].set(table.T)

    if chunk % (8 * 128) != 0:
        raise ValueError("chunk must be a multiple of 1024")
    sub = chunk // 8
    n_chunks = -(-n // chunk)
    idx = jnp.arange(n_chunks * chunk, dtype=jnp.int32).reshape(
        n_chunks, 8, sub
    )

    # The bundle axis is processed in static windows of W <= 256 so the
    # live one-hot tile stays (W, sub): the full (B_pad, sub) tile is
    # B_pad * sub * 4 bytes — 16 MiB at B_pad = 4096 with the default
    # chunk, which overflows scoped VMEM (same constraint as the
    # megakernel's in-kernel gather, fused_trace.py W-window).
    W = min(B_pad, 256)

    def kernel(cum_prev_ref, cum_ref, table_ref, idx_ref, out_ref):
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 0)
        acc = [jnp.zeros((8, sub), jnp.float32) for _ in range(8)]
        for s in range(8):
            idxs = idx_ref[s, :][None, :]  # (1, sub)
            val = jnp.zeros((8, sub), jnp.float32)
            for w0 in range(0, B_pad, W):
                cum_col = cum_ref[w0:w0 + W, :]        # (W, 1)
                cum_prev_col = cum_prev_ref[w0:w0 + W, :]
                oh = ((idxs >= cum_prev_col) & (idxs < cum_col)).astype(
                    jnp.float32
                )  # (W, sub), contracted immediately; never reaches HBM
                val = val + jax.lax.dot_general(
                    table_ref[:, w0:w0 + W], oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (8, sub): attribute channels for this sublane's rays
            sel = rows_i == s
            for k in range(8):
                acc[k] = acc[k] + jnp.where(sel, val[k][None, :], 0.0)
        for k in range(8):
            out_ref[k] = acc[k]

    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, sub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 8, 8, sub), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 8, 8, sub), jnp.float32),
        interpret=interpret,
    )(cum_prev_p, cum_p, table_p, idx)

    # (n_chunks, K, 8, sub) -> (n, K): ray r = (c, s, l) with
    # r = c*chunk + s*sub + l, matching jnp.arange's reshape above.
    out = jnp.moveaxis(out, 1, 3).reshape(n_chunks * chunk, 8)[:n, :K]
    return out


def interval_gather_xla(cum: jax.Array, table: jax.Array, n: int) -> jax.Array:
    """Reference XLA twin of :func:`interval_gather` (indexed gather)."""
    idx = jnp.arange(n, dtype=jnp.int32)
    bundle_id = jnp.clip(
        jnp.searchsorted(cum, idx, side="right"), 0, table.shape[0] - 1
    )
    attrs = table[bundle_id]
    valid = idx < cum[-1]
    return jnp.where(valid[:, None], attrs, 0.0)
