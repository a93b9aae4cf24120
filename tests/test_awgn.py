"""AWGN statistical gates.

* The reference's quality gate: zero decode errors at 12 dB SNR across the
  profile matrix (reference: tests/awgn_sweep_gtest.cpp:52-108 — 5 packets
  per profile through the real chain; we run more).
* PER/SNR bound parity with the reference's Python model
  (tests/awgn_sweep.py): at moderate SNR the model and our full modem chain
  must both be error-free; at very low SNR both must fail.
"""

import numpy as np
import pytest

from lora_phy_tpu.models import awgn, modem
from lora_phy_tpu.ops.impair import apply_awgn
from lora_phy_tpu.utils.profiles import DEFAULT_PROFILES
import jax


@pytest.mark.parametrize("profile", DEFAULT_PROFILES, ids=lambda p: p.name)
def test_model_error_free_at_12db(profile):
    pt = awgn.simulate(profile.sf, profile.cr, 12.0, packets=20, payload_len=16)
    assert pt.per == 0.0 and pt.ber == 0.0


@pytest.mark.parametrize("profile", DEFAULT_PROFILES, ids=lambda p: p.name)
def test_model_fails_at_very_low_snr(profile):
    pt = awgn.simulate(profile.sf, profile.cr, -25.0, packets=10, payload_len=16)
    assert pt.per > 0.5


def test_full_chain_error_free_at_12db():
    """The real modem chain (encode/modulate/dechirp/demodulate/decode)
    through AWGN at 12 dB — the awgn_sweep_gtest contract
    (reference: tests/awgn_sweep_gtest.cpp:55-105)."""
    for profile in DEFAULT_PROFILES:
        p = profile.params()
        payload = np.arange(16, dtype=np.uint8)
        syms = modem.encode(payload)
        iq = modem.modulate(syms, p)
        dech = modem.dechirp(iq, p)
        key = jax.random.PRNGKey(0)
        noisy = apply_awgn(key, dech, 12.0)
        res = modem.demodulate(noisy, p)
        out = np.asarray(modem.decode(np.asarray(res.symbols)))
        np.testing.assert_array_equal(out, payload)


def test_sweep_csv_schema(tmp_path):
    rows = awgn.sweep(DEFAULT_PROFILES[:1], snr_start=10.0, snr_stop=11.0,
                      snr_step=1.0, packets=4, payload_len=4)
    assert len(rows) == 2
    assert set(rows[0]) == {"sf", "bw", "cr", "snr_db", "ber", "per"}
    out = tmp_path / "awgn_sweep.csv"
    awgn.write_csv(rows, out)
    header = out.read_text().splitlines()[0]
    assert header == "sf,bw,cr,snr_db,ber,per"


def test_waterfall_monotone():
    """PER decreases (weakly) as SNR rises through the waterfall region."""
    pers = [
        awgn.simulate(7, "4/8", snr, packets=30, payload_len=8, seed=3).per
        for snr in (-20.0, -10.0, 0.0, 12.0)
    ]
    assert pers[0] >= pers[-1]
    assert pers[-1] == 0.0


def test_planar_simulation_matches_complex():
    """Planar Monte Carlo path == complex path (same PRNG stream, so the
    noise realisations differ only in draw order; compare at a noiseless
    point for exactness and statistically at a mid-SNR point)."""
    clean_c = awgn.simulate(7, "4/8", 60.0, packets=12, payload_len=8, seed=2)
    clean_p = awgn.simulate_planar(7, "4/8", 60.0, packets=12, payload_len=8, seed=2)
    assert clean_c.per == clean_p.per == 0.0

    mid_c = awgn.simulate(7, "4/5", -13.0, packets=200, payload_len=8, seed=2)
    mid_p = awgn.simulate_planar(7, "4/5", -13.0, packets=200, payload_len=8, seed=2)
    assert abs(mid_c.per - mid_p.per) < 0.15


def _knee_db(snrs, pers, level=0.5):
    """First PER=level crossing, linearly interpolated."""
    for i in range(1, len(snrs)):
        a, b = pers[i - 1], pers[i]
        if a >= level > b:
            return snrs[i - 1] + (a - level) / (a - b) * (snrs[i] - snrs[i - 1])
    return None


@pytest.mark.parametrize("sf,snrs", [
    (7, [-13.0, -12.0, -11.0, -10.0, -9.0, -8.0]),
    (8, [-15.0, -14.0, -13.0, -12.0, -11.0, -10.0]),
])
def test_waterfall_knee_matches_reference_model(reference_dir, sf, snrs):
    """Quantitative curve-shape parity: the PER=0.5 knee of our batched
    Monte Carlo must sit within 1 dB of the reference's own Python model
    (reference: tests/awgn_sweep.py:245-285) run at the same points, and
    the per-point PERs must agree within Monte Carlo tolerance. A
    regression shifting the waterfall by >1 dB fails here."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_awgn_sweep", reference_dir / "tests" / "awgn_sweep.py"
    )
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_awgn_sweep"] = ref   # @dataclass needs the module registered
    spec.loader.exec_module(ref)

    packets = 250
    up, down = ref.make_chirps(sf)
    np.random.seed(0)
    ref_pers = [ref.simulate(sf, "4/5", s, packets, 8, up, down)[1]
                for s in snrs]
    our_pers = [awgn.simulate(sf, "4/5", s, packets=packets, payload_len=8,
                              seed=1).per for s in snrs]

    ref_knee = _knee_db(snrs, ref_pers)
    our_knee = _knee_db(snrs, our_pers)
    assert ref_knee is not None, (snrs, ref_pers)
    assert our_knee is not None, (snrs, our_pers)
    assert abs(our_knee - ref_knee) <= 1.0, (ref_knee, our_knee)
    for s, rp, op in zip(snrs, ref_pers, our_pers):
        assert abs(rp - op) <= 0.15, (s, rp, op)


@pytest.mark.parametrize("cr", ["4/5", "4/6", "4/7", "4/8"])
def test_per_zero_at_12db_all_crs(cr):
    """PER @ 12 dB == 0 across every coding rate (the reference gate,
    awgn_sweep_gtest.cpp:55-105, extended to all CRs)."""
    pt = awgn.simulate(7, cr, 12.0, packets=50, payload_len=16, seed=4)
    assert pt.per == 0.0 and pt.ber == 0.0


def test_wilson_interval_properties():
    """Shared CI helper (utils/stats.py): bounds in [0,1], contains the
    point estimate, shrinks with n, exact edge behaviour."""
    from lora_phy_tpu.utils.stats import wilson

    assert wilson(0, 0) == (0.0, 1.0)
    lo, hi = wilson(0, 100)
    assert lo == 0.0 and 0.0 < hi < 0.05
    lo, hi = wilson(100, 100)
    assert hi == 1.0 and 0.95 < lo < 1.0
    lo1, hi1 = wilson(50, 100)
    lo2, hi2 = wilson(500, 1000)
    assert lo1 < 0.5 < hi1 and lo2 < 0.5 < hi2
    assert (hi2 - lo2) < (hi1 - lo1)          # tighter at larger n
