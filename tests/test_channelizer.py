"""Polyphase channelizer: tone separation and a full multi-channel LoRa
receive — wideband stream -> K channels -> per-channel demod/decode."""

import numpy as np
import pytest

from lora_phy_tpu.models import modem
from lora_phy_tpu.ops.channelizer import channelize, synthesize_tone_channels
from lora_phy_tpu.utils.params import LoraParams


def test_tone_separation():
    """A tone on channel c lands in output channel c with the others
    quiet."""
    k = 8
    frames = 512
    t = np.arange(frames * k)
    for c in (0, 2, 5):
        wide = np.exp(2j * np.pi * c * t / k).astype(np.complex64)
        chans = np.asarray(channelize(wide, k))
        power = np.mean(np.abs(chans) ** 2, axis=-1)
        # steady-state region (skip filter warmup)
        assert power[c] > 50 * (power.sum() - power[c] + 1e-9), power


def test_dc_tone_feedthrough_gain():
    k = 8
    wide = np.ones(4096, np.complex64)
    chans = np.asarray(channelize(wide, k))
    # unit DC input -> unit DC on channel 0 (filter normalised)
    assert abs(np.mean(chans[0, 16:]) - 1.0) < 0.05


def test_multichannel_lora_receive():
    """Two LoRa transmissions on different channels of one wideband
    stream: channelize, dechirp, demodulate, decode both payloads."""
    p = LoraParams(sf=7)
    k = 4
    pay_a = np.arange(12, dtype=np.uint8)
    pay_b = (np.arange(12, dtype=np.uint8) * 5 + 1).astype(np.uint8)

    iq_a = np.asarray(modem.modulate(modem.encode(pay_a), p))
    iq_b = np.asarray(modem.modulate(modem.encode(pay_b), p))
    sigs = np.zeros((k, iq_a.size), np.complex64)
    sigs[1] = iq_a
    sigs[3] = iq_b
    wide = np.asarray(synthesize_tone_channels(sigs, k))

    chans = np.asarray(channelize(wide, k))      # [K, T]
    for chan, payload in ((1, pay_a), (3, pay_b)):
        x = chans[chan] * k                      # undo the 1/nchan scale
        dech = modem.dechirp(x, p)
        res = modem.demodulate(np.asarray(dech), p)
        out = np.asarray(modem.decode(np.asarray(res.symbols)))
        np.testing.assert_array_equal(out, payload)
        assert int(res.sync_word) == 0x12


def test_channelizer_batched():
    """Leading batch dims flow through the filter bank."""
    k = 8
    rng = np.random.RandomState(0)
    wide = (rng.randn(3, 2048) + 1j * rng.randn(3, 2048)).astype(np.complex64)
    chans = np.asarray(channelize(wide, k))
    assert chans.shape == (3, k, 2048 // k)
    single = np.asarray(channelize(wide[1], k))
    np.testing.assert_allclose(chans[1], single, atol=1e-5)
