"""Time-sharded continuous-stream demodulation with overlap-save halos.

TPU-native replacement for the reference's whole-buffer-in-memory
demodulator (``base = s*step`` absolute indexing, reference:
src/phy/LoRaDemod.cpp:141-149; sequence-scaling analysis in SURVEY.md §5.7):

* the IQ stream is sharded into consecutive time blocks across the mesh's
  ``time`` axis (one shard per device group), frames/channels along
  ``channel``;
* the timing-offset shift reads up to one symbol across block boundaries,
  so each shard exchanges a one-symbol **overlap-save halo** with both
  neighbours via ``jax.lax.ppermute`` (SURVEY.md §5.7a);
* the 2-symbol CFO/TO estimate is computed where the frame head lives
  (time-shard 0) and broadcast to all shards with a ``psum`` — the
  collective replacement for the reference's shared workspace metrics;
* CFO derotation phase depends on the *global* symbol index
  (LoRaDemod.cpp:151-152), which each shard reconstructs from its mesh
  coordinate — the "shards must agree on absolute index" seam called out
  in SURVEY.md §5.7.

The result is bit-identical to the single-device demodulator for in-range
timing shifts (gated by tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.modem import _estimate, _round_half_away, _window_table, _sync_from_symbols
from ..ops.detect import detect
from ..ops.planar import _estimate_planar, detect_planar
from ..utils.params import LoraParams
from .mesh import CHANNEL_AXIS, TIME_AXIS

_TWO_PI = 2.0 * jnp.pi


def _stream_demod_local(x_local, params: LoraParams, backend: str,
                        time_axis: str):
    """Per-shard body (runs under shard_map). ``x_local``: [..., L]."""
    n, osr, step = params.n, params.osr, params.step
    halo = step
    L = x_local.shape[-1]
    s_per_block = L // step
    window = _window_table(params)

    t_idx = jax.lax.axis_index(time_axis)
    t_size = jax.lax.axis_size(time_axis)

    # --- global per-channel amplitude normalisation (LoRaDemod.cpp:59-77) -
    local_max = jnp.max(
        jnp.maximum(jnp.abs(jnp.real(x_local)), jnp.abs(jnp.imag(x_local))),
        axis=-1,
    )
    max_amp = jax.lax.pmax(local_max, time_axis)
    scale = jnp.where(max_amp > 1.0, 1.0 / max_amp, 1.0).astype(jnp.float32)
    x_local = x_local * scale[..., None]

    # --- overlap-save halo exchange (ring; edge devices get zeros masked) --
    right_head = x_local[..., :halo]       # my first samples -> left neighbour
    left_tail = x_local[..., -halo:]       # my last samples -> right neighbour
    # receive the *next* block's head as my right halo
    right_halo = jax.lax.ppermute(
        right_head, time_axis,
        [(i, (i - 1) % t_size) for i in range(t_size)],
    )
    # receive the *previous* block's tail as my left halo
    left_halo = jax.lax.ppermute(
        left_tail, time_axis,
        [(i, (i + 1) % t_size) for i in range(t_size)],
    )
    is_first = t_idx == 0
    is_last = t_idx == t_size - 1
    left_halo = jnp.where(is_first, 0.0, left_halo)
    right_halo = jnp.where(is_last, 0.0, right_halo)
    ext = jnp.concatenate([left_halo, x_local, right_halo], axis=-1)

    # --- frame-head CFO/TO estimate, broadcast from time-shard 0 ----------
    cfo_l, to_l = _estimate(
        x_local[..., : 2 * step], n, osr, window, tie_break_idx=True,
        backend=backend,
    )
    sel = (t_idx == 0).astype(cfo_l.dtype)
    cfo = jax.lax.psum(cfo_l * sel, time_axis)
    time_offset = jax.lax.psum(to_l * sel, time_axis)

    t_off = _round_half_away(time_offset).astype(jnp.int32)
    rate = (-jnp.float32(_TWO_PI) * cfo / jnp.float32(n)).astype(jnp.float32)

    # --- shifted symbol windows from the extended (haloed) buffer ---------
    # contiguous per-row dynamic slices instead of element gathers (the
    # same 35x TPU consideration as modem._shifted_rows)
    total = t_size * L                      # global stream length

    def slice_rows(offset):
        """ext[..., offset : offset+L] with per-channel traced offset."""
        flat_ext = ext.reshape(-1, ext.shape[-1])
        off = jnp.broadcast_to(jnp.asarray(offset, jnp.int32).reshape(-1),
                               (flat_ext.shape[0],))
        rows = jax.vmap(
            lambda row, st: jax.lax.dynamic_slice(row, (st,), (L,))
        )(flat_ext, off)
        return rows.reshape(*ext.shape[:-1], L)

    def symview(a):
        v = a.reshape(*a.shape[:-1], s_per_block, n, osr)
        return v[..., 0]

    base_view = ext[..., halo: halo + L]
    shift_view = slice_rows(jnp.clip(t_off + halo, 0, 2 * halo))

    s_local = jnp.arange(s_per_block, dtype=jnp.int32)
    g_base = t_idx.astype(jnp.int32) * L + s_local * step   # global base
    t = t_off[..., None]
    use_shift = ((t > 0) & (g_base + t + step <= total)) | (
        (t < 0) & (-t <= g_base)
    )
    sym = jnp.where(use_shift[..., None], symview(shift_view), symview(base_view))

    # --- CFO derotation: only the per-sample ramp ------------------------
    # The reference's full phase is rate*(s_global*N + t_off/osr) + rate*i;
    # the global-symbol-index start term is constant WITHIN a symbol, so it
    # contributes only a unimodular per-symbol phase — invisible to the
    # magnitude-based detector (modem._derotation_vector documents and
    # drops it on the single-device path; the [.., S, 1]-rank broadcast it
    # needed is also a layout-rotation trigger on this chip, CLAUDE.md).
    # Global-index CORRECTNESS still holds: shards agree because the
    # surviving ramp exp(j*rate*i) is index-free within the window.
    ph = rate[..., None] * jnp.arange(n, dtype=jnp.float32)       # [..., N]
    rot = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))[..., None, :]
    fft_in = sym * rot
    if window is not None:
        fft_in = fft_in * jnp.asarray(window)

    det = detect(fft_in, backend=backend)
    return det.index.astype(jnp.uint16), cfo, time_offset


def _stream_demod_local_planar(xr, xi, params: LoraParams, time_axis: str):
    """Planar (re, im float32) twin of :func:`_stream_demod_local` — the
    same halo-exchange/psum-broadcast/global-index recipe on split planes,
    so the time-sharded receiver compiles on complex-free TPU PJRTs
    (the deployment reality, CLAUDE.md). Both planes ride each collective
    stacked, halving the ppermute count."""
    n, osr, step = params.n, params.osr, params.step
    halo = step
    L = xr.shape[-1]
    s_per_block = L // step
    window = _window_table(params)

    t_idx = jax.lax.axis_index(time_axis)
    t_size = jax.lax.axis_size(time_axis)

    # --- global per-channel amplitude normalisation (LoRaDemod.cpp:59-77) -
    local_max = jnp.max(
        jnp.maximum(jnp.abs(xr), jnp.abs(xi)), axis=-1
    )
    max_amp = jax.lax.pmax(local_max, time_axis)
    scale = jnp.where(max_amp > 1.0, 1.0 / max_amp, 1.0).astype(jnp.float32)
    xr = xr * scale[..., None]
    xi = xi * scale[..., None]

    # --- overlap-save halo exchange (planes stacked: one ppermute each way)
    planes = jnp.stack([xr, xi], axis=0)            # [2, ..., L]
    right_halo = jax.lax.ppermute(
        planes[..., :halo], time_axis,
        [(i, (i - 1) % t_size) for i in range(t_size)],
    )
    left_halo = jax.lax.ppermute(
        planes[..., -halo:], time_axis,
        [(i, (i + 1) % t_size) for i in range(t_size)],
    )
    left_halo = jnp.where(t_idx == 0, 0.0, left_halo)
    right_halo = jnp.where(t_idx == t_size - 1, 0.0, right_halo)
    ext = jnp.concatenate([left_halo, planes, right_halo], axis=-1)

    # --- frame-head CFO/TO estimate, broadcast from time-shard 0 ----------
    cfo_l, to_l = _estimate_planar(
        xr[..., : 2 * step], xi[..., : 2 * step], n, osr, window,
        tie_break_idx=True,
    )
    sel = (t_idx == 0).astype(cfo_l.dtype)
    cfo = jax.lax.psum(cfo_l * sel, time_axis)
    time_offset = jax.lax.psum(to_l * sel, time_axis)

    t_off = _round_half_away(time_offset).astype(jnp.int32)
    rate = (-jnp.float32(_TWO_PI) * cfo / jnp.float32(n)).astype(jnp.float32)

    # --- shifted symbol windows from the extended (haloed) buffer ---------
    total = t_size * L

    def slice_rows(offset):
        flat_ext = ext.reshape(-1, ext.shape[-1])
        off = jnp.broadcast_to(
            jnp.asarray(offset, jnp.int32).reshape(-1), (flat_ext.shape[0],)
        )
        rows = jax.vmap(
            lambda row, st: jax.lax.dynamic_slice(row, (st,), (L,))
        )(flat_ext, off)
        return rows.reshape(*ext.shape[:-1], L)

    def symview(a):
        v = a.reshape(*a.shape[:-1], s_per_block, n, osr)
        return v[..., 0]

    base_view = ext[..., halo: halo + L]
    # offset is per-channel; broadcast across the stacked plane axis
    off = jnp.clip(t_off + halo, 0, 2 * halo)
    shift_view = slice_rows(jnp.broadcast_to(off, ext.shape[:-1]))

    s_local = jnp.arange(s_per_block, dtype=jnp.int32)
    g_base = t_idx.astype(jnp.int32) * L + s_local * step
    t = t_off[..., None]
    use_shift = ((t > 0) & (g_base + t + step <= total)) | (
        (t < 0) & (-t <= g_base)
    )
    sym = jnp.where(use_shift[..., None], symview(shift_view), symview(base_view))
    sr, si = sym[0], sym[1]

    # --- CFO derotation: only the per-sample ramp ------------------------
    # The reference's full phase is rate*(s_global*N + t_off/osr) + rate*i;
    # the global-symbol-index start term is constant WITHIN a symbol, so it
    # contributes only a unimodular per-symbol phase — invisible to the
    # magnitude-based detector (modem._derotation_vector documents and
    # drops it on the single-device path; the [.., S, 1]-rank broadcast it
    # needed is also a layout-rotation trigger on this chip, CLAUDE.md).
    # Global-index CORRECTNESS still holds: shards agree because the
    # surviving ramp exp(j*rate*i) is index-free within the window.
    ph = rate[..., None] * jnp.arange(n, dtype=jnp.float32)       # [..., N]
    c = jnp.cos(ph)[..., None, :]
    s = jnp.sin(ph)[..., None, :]
    fr = sr * c - si * s
    fi = sr * s + si * c
    if window is not None:
        w = jnp.asarray(window)
        fr, fi = fr * w, fi * w

    det = detect_planar(fr, fi, n)
    return det.index.astype(jnp.uint16), cfo, time_offset


@partial(jax.jit, static_argnames=("params", "mesh"))
def demodulate_stream_planar(xr, xi, params: LoraParams, mesh: Mesh):
    """Planar twin of :func:`demodulate_stream`: a dechirped continuous
    stream as (re, im) float32 planes sharded over ``(channel, time)``.
    Bit-identical symbols to the complex path (tests/test_parallel.py)."""
    fn = shard_map(
        partial(_stream_demod_local_planar, params=params,
                time_axis=TIME_AXIS),
        mesh=mesh,
        in_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS, TIME_AXIS)),
        out_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS), P(CHANNEL_AXIS)),
    )
    syms, cfo, time_offset = fn(xr, xi)
    sync = _sync_from_symbols(
        syms[..., 0].astype(jnp.int32), syms[..., 1].astype(jnp.int32), params.sf
    )
    return syms, sync, cfo, time_offset


@partial(jax.jit, static_argnames=("params", "mesh", "backend"))
def demodulate_stream(samples, params: LoraParams, mesh: Mesh,
                      backend: str = "auto"):
    """Demodulate a dechirped continuous stream sharded over
    ``(channel, time)``.

    ``samples``: [channels, T] complex64 (T divisible by
    ``time_axis_size * step``). The first two symbols of the stream are the
    sync word (reference contract). Returns
    ``(symbols [channels, T/step], sync [channels], cfo, time_offset)``
    with symbols sharded like the input.
    """
    fn = shard_map(
        partial(_stream_demod_local, params=params, backend=backend,
                time_axis=TIME_AXIS),
        mesh=mesh,
        in_specs=P(CHANNEL_AXIS, TIME_AXIS),
        out_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS), P(CHANNEL_AXIS)),
    )
    syms, cfo, time_offset = fn(samples)
    sync = _sync_from_symbols(
        syms[..., 0].astype(jnp.int32), syms[..., 1].astype(jnp.int32), params.sf
    )
    return syms, sync, cfo, time_offset
