"""Fused Pallas dechirp-detection kernel == unfused planar pipeline
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

from lora_phy_tpu.models import modem
from lora_phy_tpu.ops import planar
from lora_phy_tpu.utils.params import LoraParams, Window


def _case(p, payload_len=16, batch=None, seed=0):
    rng = np.random.RandomState(seed)
    shape = (batch, payload_len) if batch else (payload_len,)
    payloads = rng.randint(0, 256, shape).astype(np.uint8)
    syms = modem.encode(payloads)
    iq = modem.modulate(syms, p)
    dech = np.asarray(modem.dechirp(iq, p))
    return payloads, dech


@pytest.mark.parametrize("sf", [5, 7])
def test_fused_matches_unfused(sf):
    p = LoraParams(sf=sf)
    payloads, dech = _case(p)
    xr, xi = planar.split_complex(dech)
    ref = planar.demodulate_planar(xr, xi, p, fused=False)
    got = planar.demodulate_planar(xr, xi, p, fused=True)
    np.testing.assert_array_equal(np.asarray(got.symbols), np.asarray(ref.symbols))
    assert int(got.sync_word) == int(ref.sync_word)


def test_fused_batched_decodes():
    p = LoraParams(sf=7)
    payloads, dech = _case(p, payload_len=8, batch=4)
    xr, xi = planar.split_complex(dech)
    got = planar.demodulate_planar(xr, xi, p, fused=True)
    out = np.asarray(modem.decode(np.asarray(got.symbols)))
    np.testing.assert_array_equal(out, payloads)


def test_fused_windowed():
    p = LoraParams(sf=7, window=Window.HANN)
    payloads, dech = _case(p, payload_len=8)
    xr, xi = planar.split_complex(dech)
    ref = planar.demodulate_planar(xr, xi, p, fused=False)
    got = planar.demodulate_planar(xr, xi, p, fused=True)
    np.testing.assert_array_equal(np.asarray(got.symbols), np.asarray(ref.symbols))


def test_fused_tie_break():
    """Equal-power bins resolve to the lowest index inside the kernel."""
    from lora_phy_tpu.ops.pallas_demod import fused_detect_rows
    import jax.numpy as jnp

    p = LoraParams(sf=7)
    n = p.n
    # alternating impulse train: bins 0 and 64 exactly equal (the SF2
    # equal_power_bin_test fixture generalised to N=128)
    x = np.zeros(n, np.float32)
    x[::2] = 1.0
    xr = jnp.asarray(x)[None]
    xi = jnp.zeros((1, n), jnp.float32)
    bins = fused_detect_rows(xr, xi, jnp.zeros(1), jnp.zeros(1), p)
    assert int(np.asarray(bins)[0]) == 0
