#!/usr/bin/env python3
"""Per-stage profile of the block receiver at the bench shape.

Reproduces bench.py's block-receiver workload (8 channels x 512 frames of
16-byte payloads, SF7, ~25.3M samples) and times CUMULATIVE prefixes of
the receive_block_planar pipeline, each compiled as its own jit returning
a scalar checksum (so XLA cannot dead-code the stage under test, and the
d2h of the scalar is the completion barrier this PJRT needs, CLAUDE.md).

Deltas between consecutive prefixes attribute wall time to: scan,
candidate select, window gather+shift, SFD probes, hypothesis window
select, derotation+dechirp, demod spectrum+decisions, SNR+SRO
observables.

Usage: python tools/profile_block_rx.py [--frames=512]
"""

from __future__ import annotations

import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lora_phy_tpu.models import modem
    from lora_phy_tpu.models import stream as streammod
    from lora_phy_tpu.models import sync as syncmod
    from lora_phy_tpu.models.stream import frame_overhead_samples
    from lora_phy_tpu.models.sync import _kth_valid, frame_sync_scan_planar
    from lora_phy_tpu.ops.chirp import base_downchirp_planar
    from lora_phy_tpu.ops.planar import (
        _preamble_phase_step, argmax_bins_planar, dechirp_planar,
        demodulate_spectrum_planar, estimate_preamble_planar,
        estimate_sro_planar,
    )
    from lora_phy_tpu.utils.params import LoraParams

    fpc = 512
    for a in sys.argv[1:]:
        if a.startswith("--frames="):
            fpc = int(a.split("=")[1])

    params = LoraParams(sf=7)
    platform = jax.default_backend()
    if platform == "cpu":
        fpc = min(fpc, 8)
    channels, pl_len = 8, 16
    n_pay = pl_len * 2
    gap = 4 * params.step
    rng = np.random.RandomState(0)
    pay_blk = rng.randint(0, 256, (channels, pl_len)).astype(np.uint8)
    dev = jax.devices()[0]

    @jax.jit
    def framed_stream(pl):
        syms = modem.encode(pl)
        fr, fi = streammod.frame_modulate_planar(syms, params)
        z = jnp.zeros((channels, gap), jnp.float32)
        return (jnp.tile(jnp.concatenate([fr, z], -1), (1, fpc)),
                jnp.tile(jnp.concatenate([fi, z], -1), (1, fpc)))

    br, bi = framed_stream(jax.device_put(pay_blk, dev))
    np.asarray(br[0, :2])
    total = br.shape[0] * br.shape[1]
    print(f"workload: {total/1e6:.1f}M samples, {channels}x{fpc} frames",
          file=sys.stderr)

    # ---- pipeline stages, mirroring models/sync.py receive_block_planar --
    n, osr, step = params.n, params.osr, params.step
    max_frames, preamble_len = fpc, 8
    pre_len = preamble_len * step
    overhead = frame_overhead_samples(params, preamble_len)
    win_full = overhead + n_pay * step
    nwin_f = win_full // step + 4
    win_len = pre_len + (2 + n_pay) * step
    _pps = _preamble_phase_step(params.sf, params.osr, params.scale)

    def stage_scan(xr, xi):
        return frame_sync_scan_planar(xr, xi, params, preamble_len,
                                      min_power_db=-30.0)

    def stage_select(xr, xi):
        scan = stage_scan(xr, xi)
        pos, found = _kth_valid(scan.valid, max_frames)

        def pick(field):
            return jnp.take_along_axis(field, pos, axis=-1)

        return pick(scan.start), pick(scan.cfo_bins), found

    def make_gather(xr, xi):
        start, cfo_bins, found = stage_select(xr, xi)
        lead = xr.shape[:-1]
        T = xr.shape[-1]
        w0 = jnp.floor_divide(start, step)
        rsub = jnp.mod(start, step)
        widx = w0[..., None] + 1 + jnp.arange(nwin_f, dtype=jnp.int32)

        def gather_shift(plane):
            tail = (nwin_f + 2) * step + (-T) % step
            pad = jnp.pad(plane,
                          [(0, 0)] * (plane.ndim - 1) + [(2 * step, tail)])
            rows = pad.reshape(*lead, -1, step)
            idx = jnp.clip(widx, 0, rows.shape[-2] - 1)
            g = jnp.take_along_axis(rows[..., None, :, :], idx[..., None],
                                    axis=-2)
            x = g.reshape(*lead, max_frames, nwin_f * step)
            for b in range((step - 1).bit_length()):
                k = 1 << b
                on = ((rsub >> b) & 1).astype(bool)[..., None]
                sh = jnp.concatenate(
                    [x[..., k:], jnp.zeros(x.shape[:-1] + (k,), x.dtype)], -1)
                x = jnp.where(on, sh, x)
            return x

        return gather_shift(xr), gather_shift(xi), start, cfo_bins, found

    def stage_gather(xr, xi):
        gr_, gi_, start, cfo_bins, found = make_gather(xr, xi)
        return gr_, gi_

    dr0_np, di0_np = base_downchirp_planar(params.sf, params.scale, params.osr)

    def make_hyp(gr_, gi_):
        lead = gr_.shape[:-2]
        dr0, di0 = jnp.asarray(dr0_np), jnp.asarray(di0_np)

        def _probe(a, down: bool):
            sr = gr_[..., a:a + step]
            si_ = gi_[..., a:a + step]
            if down:
                ur, ui = sr * dr0 + si_ * di0, si_ * dr0 - sr * di0
            else:
                ur, ui = sr * dr0 - si_ * di0, si_ * dr0 + sr * di0
            ur = ur.reshape(*lead, max_frames, n, osr)[..., 0]
            ui = ui.reshape(*lead, max_frames, n, osr)[..., 0]
            _, pk = argmax_bins_planar(ur, ui, n, with_peak=True)
            return pk

        def hyp_score(boff):
            return (_probe(boff + (preamble_len + 1) * step, down=False)
                    + _probe(boff + (preamble_len + 2) * step, down=True))

        scores = jnp.stack([hyp_score(step), hyp_score(0),
                            hyp_score(2 * step)])
        return jnp.argmax(scores, axis=0)

    def stage_probe(xr, xi):
        gr_, gi_, start, cfo_bins, found = make_gather(xr, xi)
        hyp = make_hyp(gr_, gi_)
        return hyp, gr_

    def make_window(gr_, gi_, hyp):
        def window(buf):
            boff = (jnp.where(hyp == 1, 0, jnp.where(hyp == 2, 2, 1))
                    * step)[..., None]

            def sec(a, ln):
                early = buf[..., a:a + ln]
                mid = buf[..., a + step:a + step + ln]
                late = buf[..., a + 2 * step:a + 2 * step + ln]
                return jnp.where(boff == 0, early,
                                 jnp.where(boff == 2 * step, late, mid))

            return jnp.concatenate(
                [sec(0, pre_len), sec(pre_len, 2 * step),
                 sec(overhead, n_pay * step)], axis=-1)

        return window(gr_), window(gi_)

    def stage_window(xr, xi):
        gr_, gi_, start, cfo_bins, found = make_gather(xr, xi)
        hyp = make_hyp(gr_, gi_)
        return make_window(gr_, gi_, hyp)

    def make_derot(wr, wi, cfo_bins):
        idx = jnp.arange(win_len, dtype=jnp.float32)
        ph = (-2.0 * math.pi / step) * cfo_bins.astype(
            jnp.float32)[..., None] * idx
        c, s = jnp.cos(ph), jnp.sin(ph)
        dr = wr * c - wi * s
        di = wr * s + wi * c
        return dechirp_planar(dr, di, params)

    def stage_derot(xr, xi):
        gr_, gi_, start, cfo_bins, found = make_gather(xr, xi)
        hyp = make_hyp(gr_, gi_)
        wr, wi = make_window(gr_, gi_, hyp)
        return make_derot(wr, wi, cfo_bins)

    def make_demod(yr, yi):
        cfo_resid = estimate_preamble_planar(
            yr[..., :pre_len], yi[..., :pre_len], n, osr, phase_step=_pps)
        mag2, sync_word, cfo, time_offset = demodulate_spectrum_planar(
            yr[..., pre_len:], yi[..., pre_len:], params,
            known_offsets=(cfo_resid, jnp.zeros_like(cfo_resid)),
        )
        syms = jnp.argmax(mag2, axis=-1).astype(jnp.uint16)
        return mag2, syms, sync_word, cfo_resid

    def stage_demod(xr, xi):
        gr_, gi_, start, cfo_bins, found = make_gather(xr, xi)
        hyp = make_hyp(gr_, gi_)
        wr, wi = make_window(gr_, gi_, hyp)
        yr, yi = make_derot(wr, wi, cfo_bins)
        mag2, syms, sync_word, cfo_resid = make_demod(yr, yi)
        return syms, sync_word

    def stage_full(xr, xi):
        return syncmod.receive_block_planar(
            xr, xi, params, n_pay, max_frames=max_frames,
            min_power_db=-30.0)

    def cksum(*outs):
        acc = jnp.float32(0)
        for o in jax.tree_util.tree_leaves(outs):
            acc = acc + jnp.sum(o.astype(jnp.float32)[..., :1])
        return acc

    stages = [
        ("scan", stage_scan),
        ("select", stage_select),
        ("gather+shift", stage_gather),
        ("probes", stage_probe),
        ("hyp window", stage_window),
        ("derot+dechirp", stage_derot),
        ("demod", stage_demod),
        ("full(+snr,sro)", stage_full),
    ]

    iters = 4 if platform != "cpu" else 1
    prev = 0.0
    print(f"{'prefix':>16} {'ms':>9} {'delta ms':>9}")
    for name, fn in stages:
        f = jax.jit(lambda r, i, fn=fn: cksum(fn(r, i)))
        out = f(br, bi)
        np.asarray(out)               # compile + first run
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(br, bi)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:>16} {dt:9.2f} {dt - prev:9.2f}", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
