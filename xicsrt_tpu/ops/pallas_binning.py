"""Pallas TPU kernel for detector image binning.

The hottest op in the whole framework (SURVEY.md section 7.3 item 6): XLA's
scatter-add serializes on TPU (~35 ms for 4M rays), and the factorized
one-hot matmul in plain XLA still materializes its one-hot tiles through
HBM. This kernel streams ray chunks through VMEM, forms the per-axis
one-hot tiles on the VPU and contracts them on the MXU, accumulating the
image in a VMEM-resident output block across sequential grid steps:

    image[i, j] = sum_r w[r] * (ix[r] == i) * (iy[r] == j)
               == ((onehot_x * w)^T @ onehot_y)[i, j]

Exactly equal to the nearest-pixel reference convention
(``_TraceObject.py:257-291``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bin_kernel(ix_ref, iy_ref, w_ref, out_ref, *, nx_pad, ny_pad):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Ray chunk laid out as [8, sub] (sublane x lane tiling constraint).
    ixc = ix_ref[0]  # [8, sub] int32
    iyc = iy_ref[0]
    wc = w_ref[0]

    xbins = jax.lax.broadcasted_iota(jnp.int32, (1, nx_pad), 1)
    ybins = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad), 1)
    acc = jnp.zeros_like(out_ref)
    # Mosaic matmuls contract over a single dimension; unroll the 8
    # sublane rows as separate [sub, bins] one-hot contractions.
    for s in range(ixc.shape[0]):
        ox = (ixc[s][:, None] == xbins).astype(jnp.float32) * wc[s][:, None]
        oy = (iyc[s][:, None] == ybins).astype(jnp.float32)
        acc += jax.lax.dot_general(
            ox, oy,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("nx", "ny", "pixel_size", "chunk", "interpret")
)
def bin_image_pallas(
    x_local: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    nx: int,
    ny: int,
    pixel_size: float,
    chunk: int = 8192,
    interpret: bool = False,
) -> jax.Array:
    """Accumulate ray hits into an [nx, ny] image (TPU Pallas kernel).

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (CPU-testable; used by the test suite on the virtual-device mesh).
    """
    n = x_local.shape[0]
    f32 = jnp.float32
    px = x_local[:, 0].astype(f32) / pixel_size + (nx - 1) / 2.0
    py = x_local[:, 1].astype(f32) / pixel_size + (ny - 1) / 2.0
    ix = jnp.round(px).astype(jnp.int32)
    iy = jnp.round(py).astype(jnp.int32)
    ok = mask & (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    # Out-of-grid rays carry zero weight; park them at bin -1 (matches no
    # one-hot column).
    ix = jnp.where(ok, ix, -1)
    iy = jnp.where(ok, iy, -1)
    w = jnp.where(ok, weight.astype(f32), 0.0)

    chunk = min(chunk, max(_round_up(n, 1024), 1024))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        ix = jnp.concatenate([ix, jnp.full((pad,), -1, jnp.int32)])
        iy = jnp.concatenate([iy, jnp.full((pad,), -1, jnp.int32)])
        w = jnp.concatenate([w, jnp.zeros((pad,), f32)])
    sub = chunk // 8
    ix = ix.reshape(n_chunks, 8, sub)
    iy = iy.reshape(n_chunks, 8, sub)
    w = w.reshape(n_chunks, 8, sub)

    nx_pad = _round_up(nx, 8)
    ny_pad = _round_up(ny, 128)

    out = pl.pallas_call(
        functools.partial(_bin_kernel, nx_pad=nx_pad, ny_pad=ny_pad),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, sub), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sub), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sub), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nx_pad, ny_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nx_pad, ny_pad), f32),
        interpret=interpret,
    )(ix, iy, w)
    return out[:nx, :ny].astype(x_local.dtype)


def supports_pallas_binning(nx: int, ny: int, dtype) -> bool:
    """Pallas path is used on TPU, f32 pipelines, and reasonable image sizes
    (the one-hot matmul cost scales with nx*ny)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return nx * ny <= 1 << 20
