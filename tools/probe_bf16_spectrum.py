"""Probe: can the combined DFT dot write its spectrum in bf16?

The committed SF7 demod's last two passes are the dot's 4.2 GB f32
spectrum write + the fused mag²/argmax's 4.2 GB read (README pass
table). The dot's operands are ALREADY bf16 on this chip (XLA
auto-demotes); this probe measures writing the dot output in bf16 too —
halving those two passes — and checks decision equality on the bench
payloads at clean SNR and under AWGN.

    python tools/probe_bf16_spectrum.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _watchdog():
    def dead():
        print("TPU startup timed out", file=sys.stderr, flush=True)
        os._exit(1)
    t = threading.Timer(540.0, dead)
    t.daemon = True
    t.start()
    return t


def main():
    wd = _watchdog()
    print(f"platform {jax.default_backend()}", file=sys.stderr, flush=True)
    np.asarray(jnp.zeros(4) + 1.0)
    wd.cancel()
    print("device probe ok", file=sys.stderr, flush=True)

    from lora_phy_tpu.models import modem
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.planar import (_combined_dft_mat,
                                         _demod_stage_planar,
                                         _rotated_windows_planar)
    from lora_phy_tpu.utils.params import LoraParams

    on_cpu = jax.default_backend() == "cpu"
    params = LoraParams(sf=7)
    channels, frames = (8, 8192) if not on_cpu else (2, 16)
    pool = 64 if not on_cpu else 16
    reps = channels * frames // pool
    rng = np.random.RandomState(0)
    payloads = rng.randint(0, 256, (pool, 32)).astype(np.uint8)
    dev = jax.devices()[0]

    @jax.jit
    def make(pl):
        full = jnp.tile(pl, (reps, 1)).reshape(channels, frames, 32)
        syms = modem.encode(full)
        r, i = planar.modulate_planar(syms, params)
        return planar.dechirp_planar(r, i, params)

    xr, xi = make(jax.device_put(payloads, dev))
    np.asarray(xr[0, 0, :2])

    n = params.n

    def demod_base(r, i):
        res = planar.demodulate_planar(r, i, params)
        return res.symbols

    def demod_bf16out(r, i):
        yr, yi, rate, t_off, scale, cfo, _ = _demod_stage_planar(
            r, i, params, False, None)
        fr, fi = _rotated_windows_planar(yr, yi, rate, t_off, scale, params)
        f = jnp.concatenate([fr, fi], axis=-1)
        m = jnp.asarray(_combined_dft_mat(n))
        y = jnp.matmul(f.astype(jnp.bfloat16), m.astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
        a = y[..., :n].astype(jnp.float32)
        b = y[..., n:].astype(jnp.float32)
        return jnp.argmax(a * a + b * b, axis=-1).astype(jnp.uint16)[..., 2:]

    fb = jax.jit(demod_base)
    ff = jax.jit(demod_bf16out)
    o1 = fb(xr, xi)
    np.asarray(o1[0, 0, :2])
    o2 = ff(xr, xi)
    np.asarray(o2[0, 0, :2])
    eq = np.array_equal(np.asarray(o1[0, :pool]), np.asarray(o2[0, :pool]))
    print(f"clean decisions equal: {eq}", file=sys.stderr, flush=True)

    iters = 24 if not on_cpu else 2
    for name, f, out in (("f32-spectrum (committed)", fb, o1),
                         ("bf16-spectrum", ff, o2)):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(xr, xi)
            np.asarray(out[0, 0, :2])
            best = min(best, (time.perf_counter() - t0) / iters)
        sps = channels * frames * 66 * 128 / best
        print(f"{name:28s} {best*1e3:7.2f} ms ({sps/1e9:.2f} Gsps)",
              file=sys.stderr, flush=True)

    # noisy-decision agreement: at the sensitivity knee the two spectra
    # may disagree on borderline argmaxes — quantify the rate on a
    # SMALL batch (the full bench batch + noise copies OOM the chip)
    xr.delete()
    xi.delete()

    small = 2048 if not on_cpu else 16

    @jax.jit
    def make_small(pl):
        reps_s = max(1, small // pool)
        full = jnp.tile(pl, (reps_s, 1))[:small]
        syms = modem.encode(full)
        r, i = planar.modulate_planar(syms, params)
        return planar.dechirp_planar(r, i, params)

    sr_, si_ = make_small(jax.device_put(payloads, dev))

    from functools import partial as _p

    @_p(jax.jit, static_argnames=("snr",))
    def noisy(r, i, k, snr):
        kr, ki = jax.random.split(k)
        s = jnp.float32(10 ** (-snr / 20.0) / np.sqrt(2.0))
        return (r + s * jax.random.normal(kr, r.shape, jnp.float32),
                i + s * jax.random.normal(ki, i.shape, jnp.float32))

    for snr in (0.0, -6.0, -9.0):
        nr, ni = noisy(sr_, si_, jax.random.PRNGKey(int(3 - snr)), snr)
        d1 = np.asarray(fb(nr, ni))
        d2 = np.asarray(ff(nr, ni))
        mism = int((d1 != d2).sum())
        print(f"noisy ({snr:+.0f} dB) symbol decision mismatches "
              f"bf16-vs-f32: {mism} / {d1.size}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()


def sf12():
    """SF12 variant: bf16 output on the four-step's stage-2 dot +
    scrambled argmax (decision-only consumers)."""
    wd = _watchdog()
    np.asarray(jnp.zeros(4) + 1.0)
    wd.cancel()
    from lora_phy_tpu.models import modem
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.planar import (_argmax_natural, _combined_dft_mat,
                                         _combined_fourstep_mats,
                                         _demod_stage_planar,
                                         _rotated_windows_planar)
    from lora_phy_tpu.utils.params import LoraParams

    on_cpu = jax.default_backend() == "cpu"
    p12 = LoraParams(sf=12)
    pool, reps = 4, (256 if not on_cpu else 2)
    rng = np.random.RandomState(0)
    payloads = rng.randint(0, 256, (pool, 32)).astype(np.uint8)
    dev = jax.devices()[0]

    @jax.jit
    def make(pl):
        full = jnp.tile(pl, (reps, 1))
        syms = modem.encode(full)
        r, i = planar.modulate_planar(syms, p12)
        return planar.dechirp_planar(r, i, p12)

    xr, xi = make(jax.device_put(payloads, dev))
    np.asarray(xr[0, :2])
    n = p12.n

    def demod_base(r, i):
        return planar.demodulate_planar(r, i, p12).symbols

    def demod_bf16(r, i):
        yr, yi, rate, t_off, scale, cfo, _ = _demod_stage_planar(
            r, i, p12, False, None)
        fr, fi = _rotated_windows_planar(yr, yi, rate, t_off, scale, p12)
        m1r, n1, n2, twr_t, twi_t = _combined_fourstep_mats(n)
        lead = fr.shape[:-1]
        xst = jnp.concatenate(
            [fr.reshape(*lead, n2, n1).swapaxes(-1, -2),
             fi.reshape(*lead, n2, n1).swapaxes(-1, -2)], axis=-1)
        a = jnp.matmul(xst.astype(jnp.bfloat16),
                       jnp.asarray(_combined_dft_mat(n2),
                                   ).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        ar, ai = a[..., :n2], a[..., n2:]
        twr = jnp.asarray(twr_t.T.copy())
        twi = jnp.asarray(twi_t.T.copy())
        bs = jnp.concatenate(
            [(ar * twr - ai * twi).swapaxes(-1, -2),
             (ar * twi + ai * twr).swapaxes(-1, -2)], axis=-1)
        c = jnp.matmul(bs.astype(jnp.bfloat16),
                       jnp.asarray(m1r).astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
        cr = c[..., :n1].astype(jnp.float32)
        ci = c[..., n1:].astype(jnp.float32)
        m = cr * cr + ci * ci
        flat = m.reshape(*m.shape[:-2], n2 * n1)
        bins, _ = _argmax_natural(flat, n1, n2)
        return bins.astype(jnp.uint16)[..., 2:]

    fb, ff = jax.jit(demod_base), jax.jit(demod_bf16)
    o1 = fb(xr, xi); np.asarray(o1[0, :2])
    o2 = ff(xr, xi); np.asarray(o2[0, :2])
    eq = np.array_equal(np.asarray(o1), np.asarray(o2))
    print(f"SF12 clean decisions equal: {eq}", file=sys.stderr, flush=True)
    iters = 12 if not on_cpu else 2
    for name, f, out in (("SF12 f32 (committed)", fb, o1),
                         ("SF12 bf16-stage2", ff, o2)):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(xr, xi)
            np.asarray(out[0, :2])
            best = min(best, (time.perf_counter() - t0) / iters)
        sps = xr.size / best
        print(f"{name:24s} {best*1e3:7.2f} ms ({sps/1e9:.2f} Gsps)",
              file=sys.stderr, flush=True)


def sf7_bf16cond():
    """SF7 variant: the guarded-shift cond's branches CAST to bf16 on
    write (windows output bf16), so the derotation reads half the bytes
    and the whole decision tail is bf16 — on top of the shipped bf16
    spectrum. Checks decision equality + timing.

    VERDICT (chip-measured): REGRESSES, 60.4 -> 68.4 ms despite moving
    fewer bytes — the same compiler behaviour as the stream-rotation
    dead end: when the cond's copy stops being the f32 frames-minor
    layout rotation XLA wants, extra copies appear elsewhere. The cond
    must stay f32; only the post-rotation dot boundary tolerates bf16.
    Kept as the documented negative result — don't redo."""
    wd = _watchdog()
    np.asarray(jnp.zeros(4) + 1.0)
    wd.cancel()
    from lora_phy_tpu.models import modem
    from lora_phy_tpu.models.modem import _shifted_rows, _round_half_away
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.planar import (_decision_bins_bf16,
                                         _estimate_planar)
    from lora_phy_tpu.utils.params import LoraParams

    on_cpu = jax.default_backend() == "cpu"
    params = LoraParams(sf=7)
    channels, frames = (8, 8192) if not on_cpu else (2, 16)
    pool = 64 if not on_cpu else 16
    reps = channels * frames // pool
    rng = np.random.RandomState(0)
    payloads = rng.randint(0, 256, (pool, 32)).astype(np.uint8)
    dev = jax.devices()[0]

    @jax.jit
    def make(pl):
        full = jnp.tile(pl, (reps, 1)).reshape(channels, frames, 32)
        syms = modem.encode(full)
        r, i = planar.modulate_planar(syms, params)
        return planar.dechirp_planar(r, i, params)

    xr, xi = make(jax.device_put(payloads, dev))
    np.asarray(xr[0, 0, :2])
    n, osr, step = params.n, params.osr, params.step

    def shifted_bf16(x, total_symbols, t_off):
        sample_count = total_symbols * step
        x = x[..., :sample_count]

        def symview(a):
            v = a.reshape(*a.shape[:-1], total_symbols, n, osr)
            return v[..., 0]

        def no_shift(x):
            return symview(x).astype(jnp.bfloat16)

        def with_shift(x):
            shifted = _shifted_rows(x, t_off, step)
            base = jnp.arange(total_symbols, dtype=jnp.int32) * step
            t = t_off[..., None].astype(jnp.int32)
            use = ((t > 0) & (base + t + step <= sample_count)) | (
                (t < 0) & (-t <= base))
            return jnp.where(use[..., None], symview(shifted),
                             symview(x)).astype(jnp.bfloat16)

        return jax.lax.cond(jnp.all(t_off == 0), no_shift, with_shift, x)

    def demod_bf16cond(r, i):
        total_symbols = r.shape[-1] // step
        r = r[..., : total_symbols * step]
        i = i[..., : total_symbols * step]
        max_amp = jnp.maximum(jnp.max(jnp.abs(r), axis=-1),
                              jnp.max(jnp.abs(i), axis=-1))
        scale = jnp.where(max_amp > 1.0, 1.0 / max_amp,
                          1.0).astype(jnp.float32)
        er = r[..., : 2 * step] * scale[..., None]
        ei = i[..., : 2 * step] * scale[..., None]
        cfo, time_offset = _estimate_planar(er, ei, n, osr, None)
        t_off = _round_half_away(time_offset).astype(jnp.int32)
        rate = (-jnp.float32(2 * np.pi) * cfo / jnp.float32(n))
        yr = shifted_bf16(r, total_symbols, t_off)
        yi = shifted_bf16(i, total_symbols, t_off)
        phi = rate[..., None] * jnp.arange(n, dtype=jnp.float32)
        c = (jnp.cos(phi) * scale[..., None])[..., None, :]
        s = (jnp.sin(phi) * scale[..., None])[..., None, :]
        # f32 internal math (windows upcast in-register), bf16 only at
        # the memory boundaries (cond output, dot operand)
        ur = yr.astype(jnp.float32)
        ui = yi.astype(jnp.float32)
        fr = ur * c - ui * s
        fi = ur * s + ui * c
        return _decision_bins_bf16(fr, fi, n).astype(jnp.uint16)[..., 2:]

    def demod_base(r, i):
        return planar.demodulate_planar(r, i, params).symbols

    fb, ff = jax.jit(demod_base), jax.jit(demod_bf16cond)
    o1 = fb(xr, xi); np.asarray(o1[0, 0, :2])
    o2 = ff(xr, xi); np.asarray(o2[0, 0, :2])
    eq = np.array_equal(np.asarray(o1[0, :256]), np.asarray(o2[0, :256]))
    print(f"SF7 bf16-cond clean decisions equal: {eq}",
          file=sys.stderr, flush=True)
    iters = 24 if not on_cpu else 2
    for name, f, out in (("SF7 committed (bf16 spec)", fb, o1),
                         ("SF7 bf16-cond windows", ff, o2)):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(xr, xi)
            np.asarray(out[0, 0, :2])
            best = min(best, (time.perf_counter() - t0) / iters)
        sps = channels * frames * 66 * 128 / best
        print(f"{name:28s} {best*1e3:7.2f} ms ({sps/1e9:.2f} Gsps)",
              file=sys.stderr, flush=True)
