"""Planar (split re/im) TPU-deployment pipeline == complex reference path.

The axon TPU PJRT implements no complex64 (verified), so the deployment
path runs planar float32; these tests gate its equality with the complex
modem across the profile matrix.
"""

import numpy as np
import pytest

from lora_phy_tpu.models import modem
from lora_phy_tpu.ops import planar
from lora_phy_tpu.utils.params import LoraParams, Window


def _case(p, payload_len=32, batch=None, seed=0):
    rng = np.random.RandomState(seed)
    shape = (batch, payload_len) if batch else (payload_len,)
    payloads = rng.randint(0, 256, shape).astype(np.uint8)
    syms = modem.encode(payloads)
    iq = modem.modulate(syms, p)
    dech = np.asarray(modem.dechirp(iq, p))
    return payloads, dech


@pytest.mark.parametrize("sf", [7, 9, 12])
def test_planar_matches_complex(sf):
    p = LoraParams(sf=sf)
    payloads, dech = _case(p)
    ref = modem.demodulate(dech, p)
    xr, xi = planar.split_complex(dech)
    res = planar.demodulate_planar(xr, xi, p)
    np.testing.assert_array_equal(np.asarray(res.symbols), np.asarray(ref.symbols))
    assert int(res.sync_word) == int(ref.sync_word)
    np.testing.assert_allclose(float(res.cfo), float(ref.cfo), atol=1e-5)
    np.testing.assert_allclose(
        float(res.time_offset), float(ref.time_offset), atol=0.5 + 2e-4 * p.step
    )


@pytest.mark.parametrize("osr", [2, 4])
def test_planar_oversampled(osr):
    p = LoraParams(sf=7, osr=osr)
    payloads, dech = _case(p, payload_len=16)
    ref = modem.demodulate(dech, p)
    xr, xi = planar.split_complex(dech)
    res = planar.demodulate_planar(xr, xi, p)
    np.testing.assert_array_equal(np.asarray(res.symbols), np.asarray(ref.symbols))
    assert int(res.sync_word) == int(ref.sync_word)


def test_planar_windowed():
    p = LoraParams(sf=8, window=Window.HANN)
    payloads, dech = _case(p, payload_len=16)
    ref = modem.demodulate(dech, p)
    xr, xi = planar.split_complex(dech)
    res = planar.demodulate_planar(xr, xi, p)
    np.testing.assert_array_equal(np.asarray(res.symbols), np.asarray(ref.symbols))


def test_planar_batched_decodes():
    p = LoraParams(sf=7)
    payloads, dech = _case(p, payload_len=24, batch=6)
    xr, xi = planar.split_complex(dech)
    res = planar.demodulate_planar(xr, xi, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payloads)
    np.testing.assert_array_equal(np.asarray(res.sync_word), [0x12] * 6)


def test_planar_normalisation():
    p = LoraParams(sf=7)
    payloads, dech = _case(p, payload_len=8)
    xr, xi = planar.split_complex(dech * 4.0)
    res = planar.demodulate_planar(xr, xi, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payloads)


@pytest.mark.parametrize("n", [64, 128, 512, 4096])
def test_dft_planar_matches_numpy(n):
    rng = np.random.RandomState(1)
    x = (rng.randn(5, n) + 1j * rng.randn(5, n)).astype(np.complex64)
    yr, yi = planar.dft_planar(
        np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag), n
    )
    ref = np.fft.fft(x)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(got, ref, atol=2e-2 * np.sqrt(n))


def test_planar_knobs_equivalent():
    """assume_normalized and bf16 precision keep symbol decisions exact on
    clean loopback (bf16 accuracy is opt-in; gated here at high SNR)."""
    p = LoraParams(sf=7)
    payloads, dech = _case(p, payload_len=16)
    xr, xi = planar.split_complex(dech)
    ref = planar.demodulate_planar(xr, xi, p)
    fast = planar.demodulate_planar(xr, xi, p, assume_normalized=True,
                                    precision="bf16")
    np.testing.assert_array_equal(np.asarray(fast.symbols), np.asarray(ref.symbols))
    assert int(fast.sync_word) == int(ref.sync_word)


def test_planar_noise_power_observable():
    """power/power_avg mirror the complex detector's SNR observables."""
    from lora_phy_tpu.ops.detect import detect as detect_c

    rng = np.random.RandomState(0)
    x = (rng.randn(4, 128) + 1j * rng.randn(4, 128)).astype(np.complex64)
    ref = detect_c(x)
    got = planar.detect_planar(
        np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag), 128
    )
    np.testing.assert_allclose(np.asarray(got.power), np.asarray(ref.power),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.power_avg),
                               np.asarray(ref.power_avg), atol=1e-3)
