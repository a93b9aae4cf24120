"""Stage-by-stage parity against goldens produced by the reference library
(tools/gen_golden_probe.cpp run against the built reference): encode symbols
bit-exact, modulated IQ within a float-accumulation envelope, dechirped
demod symbols/sync bit-exact, CFO/TO close, decoded bytes bit-exact.

Covers the reference's working end-to-end contract (SURVEY.md §3.3,
reference: tests/e2e_chain_test.cpp:54-117) over SF7–SF12, BW 125/250/500,
osr 1/2/4 and the Hann window.
"""

import pathlib

import numpy as np
import pytest

from lora_phy_tpu.models import modem
from lora_phy_tpu.ops.chirp import base_downchirp
from lora_phy_tpu.utils.params import Bandwidth, LoraParams, Window

GOLDEN = sorted((pathlib.Path(__file__).parent / "fixtures" / "golden").glob("*.npz"))


def _params(name: str) -> LoraParams:
    toks = name.split("_")
    sf = int(toks[0][2:])
    bw = Bandwidth(int(toks[1][2:]))
    osr = int(toks[2][3:])
    win = Window.HANN if toks[3][3:] == "1" else Window.NONE
    return LoraParams(sf=sf, bw=bw, osr=osr, window=win)


@pytest.fixture(scope="module", params=GOLDEN, ids=lambda p: p.stem)
def golden(request):
    return request.param.stem, np.load(request.param)


def test_encode_parity(golden):
    name, g = golden
    syms = np.asarray(modem.encode(g["payload"]))
    np.testing.assert_array_equal(syms, g["symbols"])


def _seq_genchirp_f64(n, osr, nn, f0, down, bw_scale, phase0=0.0):
    """Float64 sequential oracle of the reference chirp recurrence
    (reference: ChirpGenerator.hpp:23-50) for validating the closed form."""
    import math

    f_min = -math.pi * bw_scale / osr
    f_max = math.pi * bw_scale / osr
    f_step = (2 * math.pi * bw_scale) / (n * osr * osr)
    f = f_min + f0
    phase = phase0
    out = np.empty(nn, dtype=np.complex64)
    for i in range(nn):
        f += f_step
        if f > f_max:
            f -= f_max - f_min
        phase = phase - f if down else phase + f
        out[i] = np.exp(1j * phase)
    phase -= np.floor(phase / (2 * math.pi)) * (2 * math.pi)
    return out, phase


def _flip_residual(mine, ref, p: LoraParams) -> float:
    """Phase residual between two chirp signals modulo the reference's
    boundary-wrap ambiguity: its float32 accumulator can wrap one sample
    early where the exact value hits fMax, shifting subsequent phase by
    ``range = 2*pi*bw_scale/osr`` (invisible mod 2pi unless osr > bw_scale).
    """
    import math

    rng = 2 * math.pi * p.scale / p.osr
    rng_mod = rng % (2 * math.pi)
    dphi = np.angle(mine * np.conj(ref))
    if rng_mod > 1e-9 and (2 * math.pi - rng_mod) > 1e-9:
        q = np.round(dphi / rng_mod)
        dphi = dphi - q * rng_mod
        dphi = (dphi + math.pi) % (2 * math.pi) - math.pi
    return float(np.abs(dphi).max())


def test_downchirp_vs_float64_oracle(golden):
    """Closed-form lattice == float64 sequential recurrence (modulo the
    rounding-unstable wrap at the exact sweep-end sample)."""
    name, g = golden
    p = _params(name)
    down = np.asarray(base_downchirp(p.sf, p.scale, p.osr))
    oracle, _ = _seq_genchirp_f64(p.n, p.osr, p.step, 0.0, True, p.scale)
    resid = _flip_residual(down, oracle, p)
    assert resid < 1e-5, f"oracle residual {resid:.2e}"


def test_downchirp_parity(golden):
    """vs the reference binary: phase-equivalent modulo its float32
    drift envelope and boundary-wrap flips."""
    name, g = golden
    p = _params(name)
    down = np.asarray(base_downchirp(p.sf, p.scale, p.osr))
    tol = 2e-3 * p.n * p.scale / 64.0
    resid = _flip_residual(down, g["down"], p)
    assert resid < tol, f"downchirp residual {resid:.3e} (tol {tol:.1e})"


def test_modulate_vs_float64_oracle(golden):
    """Closed-form modulator == float64 sequential lora_modulate port
    (reference: src/phy/LoRaMod.cpp:8-43) including sync symbols and the
    cross-symbol phase-continuity carry."""
    import math

    name, g = golden
    p = _params(name)
    iq = np.asarray(modem.modulate(g["symbols"], p))
    shift = p.sf - 4 if p.sf > 4 else 0
    sw = [((p.sync_word >> 4) & 0xF) << shift, (p.sync_word & 0xF) << shift]
    allsyms = sw + list(g["symbols"])
    phase = 0.0
    chunks = []
    for sym in allsyms:
        f0 = 2 * math.pi * sym * p.scale / (p.n * p.osr)
        chunk, phase = _seq_genchirp_f64(p.n, p.osr, p.step, f0, False, p.scale, phase)
        chunks.append(chunk)
    oracle = np.concatenate(chunks)
    # at exact sweep-boundary samples the wrap decision is rounding-unstable
    # in any sequential float implementation; compare modulo wrap flips
    resid = _flip_residual(iq, oracle, p)
    assert resid < 1e-5, f"oracle residual {resid:.2e}"
    np.testing.assert_allclose(np.abs(iq), np.abs(oracle), atol=1e-6)


def test_modulate_parity_prefix(golden):
    """vs the reference binary: the first two symbols (before float32 drift
    accumulates) are phase-equivalent modulo wrap flips; full-frame parity
    is covered at symbol level by cross-demodulation (the reference binary
    demodulates our IQ symbol-exactly — verified when fixtures were built)."""
    name, g = golden
    p = _params(name)
    iq = np.asarray(modem.modulate(g["symbols"], p))
    ref = g["iq"]
    assert iq.shape == ref.shape
    np.testing.assert_allclose(np.abs(iq), 1.0, atol=1e-5)
    prefix = 2 * p.step
    tol = 2e-3 * p.n * p.scale / 64.0
    resid = _flip_residual(iq[:prefix], ref[:prefix], p)
    assert resid < max(tol, 4e-3), f"IQ prefix residual {resid:.3e}"


def test_demodulate_parity(golden):
    name, g = golden
    p = _params(name)
    dech = modem.dechirp(np.asarray(g["iq"]), p)
    res = modem.demodulate(dech, p)
    got = np.concatenate([np.asarray([0, 0], np.uint16), np.asarray(res.symbols)])
    # golden demod.u16 excludes the 2 sync symbols (demodulate returns count-2)
    np.testing.assert_array_equal(np.asarray(res.symbols), g["demod"])
    assert int(res.sync_word) == int(g["sync"])
    np.testing.assert_allclose(float(res.cfo), float(g["cfo"]), atol=2e-4)
    # fractional-bin interpolation differs at the 1e-4 level between
    # XLA's FFT and kissfft; the TO estimate amplifies it by N*osr
    # Hann widens the peak, so the fractional interpolator's FFT-rounding
    # sensitivity grows a further ~10x
    frac_tol = 5e-3 if p.window == Window.HANN else 4e-4
    np.testing.assert_allclose(
        float(res.time_offset), float(g["time_offset"]),
        atol=0.51 + frac_tol * p.n * p.osr,
    )


def test_decode_parity(golden):
    name, g = golden
    decoded = np.asarray(modem.decode(g["demod"]))
    np.testing.assert_array_equal(decoded, g["decoded"])


def test_demod_of_own_modulation(golden):
    """Full own-chain round trip on the golden configs; byte-exact for
    BW125 (the reference's tested envelope, tests/e2e_chain_test.cpp)."""
    name, g = golden
    p = _params(name)
    syms = modem.encode(g["payload"])
    iq = modem.modulate(syms, p)
    dech = modem.dechirp(iq, p)
    res = modem.demodulate(dech, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    if p.bw == Bandwidth.BW_125:
        np.testing.assert_array_equal(out, g["payload"])
        assert int(res.sync_word) == 0x12
    else:
        # reference behaviour: bins scale by bw_scale (aliased) — parity
        # with the reference's own decode of the same chain instead
        np.testing.assert_array_equal(out, g["decoded"])
