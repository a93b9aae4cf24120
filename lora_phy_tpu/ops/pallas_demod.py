"""Fused dechirp-detection Pallas kernel.

The per-symbol hot loop of the receiver — CFO derotation, N-point DFT,
|.|^2, argmax — fused into one Mosaic kernel so the spectrum and power
tensors never round-trip through HBM (SURVEY.md §2.6: "Pallas
dechirp-multiply + FFT kernel, vectorized argmax").

Layout: rows = symbols (batch x frames x symbols flattened), lanes = the
N FFT bins. The DFT runs as four real MXU matmuls against resident
[N, N] cos/sin matrices (N <= 128 fits one MXU tile; larger SFs use the
four-step path in ops.planar instead). The derotation phasor is computed
in-kernel on the VPU from per-row start/rate scalars (packed as an aux
input), so the only HBM traffic is x_re/x_im in and one int32 row out.

Tie-break: first maximum (lowest bin), implemented as
``min(where(mag == rowmax, col, N))`` — identical to the reference's
strict ``>`` scan (LoRaDetector.hpp:52-57).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.params import LoraParams
from ..models.modem import _window_table

# rows per grid step: large tiles amortise per-step pipeline overhead
# (256-row tiles measured 2110 steps x ~0.1 ms fixed cost on v5e);
# VMEM at 2048 rows: (2 in + 1 aux + 1 out) x 2048x128x4B x double-buffer
# ~ 8 MB + the resident DFT tables — inside the 16 MB budget
_TILE_ROWS = 2048


@functools.lru_cache(maxsize=16)
def _dft_tables(n: int, window_key):
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    wr = np.cos(ang).astype(np.float32)
    wi = (-np.sin(ang)).astype(np.float32)
    if window_key is not None:
        w = np.asarray(window_key, dtype=np.float32)
        wr = wr * w[:, None]
        wi = wi * w[:, None]
    return wr, wi


def _kernel(aux_ref, xr_ref, xi_ref, wr_ref, wi_ref, out_ref):
    n = xr_ref.shape[-1]
    start = aux_ref[:, 0:1]                           # [TB, 1]
    rate = aux_ref[:, 1:2]
    # Mosaic iota must be integer-typed; cast to float after
    col = jax.lax.broadcasted_iota(
        jnp.int32, (aux_ref.shape[0], n), 1
    ).astype(jnp.float32)
    ph = start + rate * col
    c = jnp.cos(ph)
    s = jnp.sin(ph)
    xr = xr_ref[:]
    xi = xi_ref[:]
    fr = xr * c - xi * s                              # derotated (window is
    fi = xr * s + xi * c                              # folded into W tables)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    zr = dot(fr, wr_ref[:]) - dot(fi, wi_ref[:])
    zi = dot(fr, wi_ref[:]) + dot(fi, wr_ref[:])
    mag = zr * zr + zi * zi
    rowmax = jnp.max(mag, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    idx = jnp.min(jnp.where(mag == rowmax, cols, n), axis=1, keepdims=True)
    out_ref[:] = jnp.broadcast_to(idx, out_ref.shape).astype(jnp.int32)


def fused_detect_rows(xr, xi, start, rate_rows, params: LoraParams,
                      interpret: bool = False):
    """Fused detection over [B, N] planar rows.

    ``start``/``rate_rows``: [B] per-row derotation phase offset and
    per-sample rate. Returns [B] int32 argmax bins.
    """
    n = params.n
    if n > 128:
        raise ValueError("fused kernel supports N <= 128; use the planar path")
    interpret = interpret or jax.default_backend() == "cpu"
    b = xr.shape[0]
    tb = min(_TILE_ROWS, max(8, b))
    b_pad = -(-b // tb) * tb
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
        start = jnp.pad(start, (0, b_pad - b))
        rate_rows = jnp.pad(rate_rows, (0, b_pad - b))

    window = _window_table(params)
    wr, wi = _dft_tables(n, tuple(window) if window is not None else None)

    aux = jnp.stack([start, rate_rows], axis=-1)          # [B, 2]
    aux = jnp.pad(aux, ((0, 0), (0, 126)))                # lane-pad to 128

    grid = (b_pad // tb,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, 128), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * b_pad * n * n,
            bytes_accessed=b_pad * n * 8 + b_pad * 128 * 4,
            transcendentals=2 * b_pad * n,
        ),
    )(aux, jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(wr), jnp.asarray(wi))
    return out[:b, 0]


def fused_demod(yr, yi, rate, t_off, params: LoraParams,
                interpret: bool = False):
    """Fused per-symbol stage for demodulate_planar.

    ``yr, yi``: [..., S, N] gathered symbol windows; ``rate``: [...] f32;
    ``t_off``: [...] i32. Returns [..., S] int32 bins.
    """
    n, osr = params.n, params.osr
    lead = yr.shape[:-2]
    s_count = yr.shape[-2]
    s_idx = jnp.arange(s_count, dtype=jnp.float32) * jnp.float32(n)
    start = rate[..., None] * (
        s_idx + t_off.astype(jnp.float32)[..., None] / jnp.float32(osr)
    )                                                      # [..., S]
    rate_rows = jnp.broadcast_to(rate[..., None], start.shape)
    b = int(np.prod(lead)) * s_count if lead else s_count
    bins = fused_detect_rows(
        yr.reshape(b, n), yi.reshape(b, n),
        start.reshape(b), rate_rows.reshape(b), params, interpret=interpret,
    )
    return bins.reshape(*lead, s_count)
