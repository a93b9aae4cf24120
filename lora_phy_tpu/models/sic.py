"""Colliding-frame receive via successive interference cancellation (SIC).

Nothing upstream survives a collision: the reference demodulates one
frame-aligned buffer at a time (src/phy/LoRaDemod.cpp:31-57 assumes the
buffer IS the frame) and gr-lora_sdr's receiver locks to a single frame
per sync. In a dense deployment two transmitters regularly overlap; the
stronger one captures the demodulator and the weaker frame is lost —
often without even syncing, because the stronger payload's chirps destroy
the equal-bin structure of the weaker preamble.

This receiver exploits the framework's exact TX model to peel frames off
in power order:

1. scan + demodulate the block (:func:`..models.sync.receive_block_planar`
   — one device program),
2. re-synthesize the strongest frame's clean baseband with the lattice
   modulator (:func:`..models.stream.frame_modulate_planar` — bit-exact
   TX), rotated by its estimated total CFO,
3. fit the complex channel gain by least squares over the frame span and
   subtract (one more device program),
4. rescan the residual. Repeat.

Decision-directed reconstruction is exact when the symbol decisions are
right, so cancellation depth is limited only by the offset-estimate
residuals (CFO to ~1e-3 bin from the preamble slope, timing to the
integer sample grid). Everything is planar float32 — the whole loop runs
on complex-free TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.params import LoraParams
from .stream import frame_modulate_planar
from .sync import block_rows, receive_block_planar

_TWO_PI = 6.283185307179586


@partial(jax.jit, static_argnames=("params", "preamble_len"))
def cancel_frame_planar(xr, xi, symbols, start, cfo_total,
                        params: LoraParams, preamble_len: int = 8,
                        sync_word=None):
    """Subtract one decoded frame from continuous ``[T]`` planes.

    ``symbols``: the frame's hard decisions ``[S] uint16``; ``start``: its
    first preamble sample (int32, traced); ``cfo_total``: integer + residual
    CFO in FFT bins (float32, traced); ``sync_word``: the frame's
    RECOVERED sync word (uint8, traced — data-dependent, so it must not
    ride the static params or every distinct word retraces the whole
    cancel program; None falls back to ``params.sync_word``). Returns
    ``(xr', xi', (gain_re, gain_im), resid_db)`` where ``resid_db`` is
    the post-subtraction power over the frame span relative to the
    pre-subtraction power — the cancellation-depth observable.
    """
    t_len = xr.shape[-1]
    if sync_word is None:
        sync_word = jnp.uint8(params.sync_word)
    shift = (params.sf - 4) if params.sf > 4 else 0
    sw = jnp.asarray(sync_word, jnp.int32)
    sync_syms = jnp.stack([((sw >> 4) & 0xF) << shift,
                           (sw & 0xF) << shift])
    rr, ri = frame_modulate_planar(symbols.astype(jnp.int32), params,
                                   preamble_len, amplitude=1.0,
                                   sync_symbols=sync_syms)
    span = rr.shape[-1]

    # estimated CFO rotation: the block receiver derotates the RECEIVED
    # window by exp(-j*2*pi*cfo_bins/step * t) (sync.receive_block_planar)
    # and measures the residual in bins over the same decimation, so the
    # received frame carries exp(+j*2*pi*cfo_total/step * (t - start)).
    ph = (jnp.float32(_TWO_PI / params.step) * cfo_total) * jnp.arange(
        span, dtype=jnp.float32)
    c, s = jnp.cos(ph), jnp.sin(ph)
    er = rr * c - ri * s
    ei = rr * s + ri * c

    # slice the frame span out of padded planes (always in range), fit the
    # complex gain by least squares, subtract, write back
    start = jnp.clip(start, 0, t_len).astype(jnp.int32)
    pr = jnp.pad(xr, (0, span))
    pi_ = jnp.pad(xi, (0, span))
    seg_r = jax.lax.dynamic_slice(pr, (start,), (span,))
    seg_i = jax.lax.dynamic_slice(pi_, (start,), (span,))

    den = jnp.maximum(jnp.sum(er * er + ei * ei), 1e-30)
    g_re = jnp.sum(seg_r * er + seg_i * ei) / den
    g_im = jnp.sum(seg_i * er - seg_r * ei) / den
    sub_r = seg_r - (g_re * er - g_im * ei)
    sub_i = seg_i - (g_re * ei + g_im * er)

    before = jnp.sum(seg_r * seg_r + seg_i * seg_i)
    after = jnp.sum(sub_r * sub_r + sub_i * sub_i)
    resid_db = 10.0 * jnp.log10(jnp.maximum(after, 1e-30) /
                                jnp.maximum(before, 1e-30))

    out_r = jax.lax.dynamic_update_slice(pr, sub_r, (start,))[..., :t_len]
    out_i = jax.lax.dynamic_update_slice(pi_, sub_i, (start,))[..., :t_len]
    return out_r, out_i, (g_re, g_im), resid_db


def receive_sic_planar(xr, xi, params: LoraParams, n_payload_symbols: int,
                       max_frames: int = 4, preamble_len: int = 8,
                       min_power_db: float | None = -30.0,
                       max_iters: int = 4, pre_acc: int = 1):
    """Iterative collision receiver over single-channel ``[T]`` planes.

    Each pass demodulates the block, records the strongest not-yet-peeled
    frame, cancels it, and rescans; it stops when a pass finds nothing new
    or after ``max_iters`` frames. Returns ``(frames, (xr', xi'))`` where
    ``frames`` is a list of dicts (``start``, ``symbols``, ``sync``,
    ``cfo_bins``, ``cfo``, ``snr_db``, ``sic_pass``, ``cancel_resid_db``)
    sorted by ``start``, and the planes are the final residual.

    Every recorded frame was demodulated from a stream with all stronger
    overlapping frames already removed — the weaker frame of a collision
    comes out clean even when the first pass could not sync on it at all.
    """
    xr = jnp.asarray(xr, jnp.float32)
    xi = jnp.asarray(xi, jnp.float32)
    decoded: list[dict] = []
    guard = params.step  # residual re-syncs within a symbol of a peel
    for it in range(max_iters):
        blk = receive_block_planar(xr, xi, params, n_payload_symbols,
                                   max_frames, preamble_len,
                                   min_power_db=min_power_db,
                                   pre_acc=pre_acc)
        rows = [r for r in block_rows(blk)
                if all(abs(r["start"] - d["start"]) > guard for d in decoded)]
        if not rows:
            break
        best = max(rows, key=lambda r: r["snr_db"])
        xr, xi, (g_re, g_im), resid_db = cancel_frame_planar(
            xr, xi, jnp.asarray(best["symbols"]),
            jnp.int32(best["start"]),
            jnp.float32(best["cfo_bins"] + best["cfo"]),
            params, preamble_len,
            sync_word=jnp.uint8(best["sync"]),
        )
        best["sic_pass"] = it
        best["cancel_resid_db"] = float(resid_db)
        best["gain"] = (float(g_re), float(g_im))
        decoded.append(best)
    decoded.sort(key=lambda r: r["start"])
    return decoded, (xr, xi)
