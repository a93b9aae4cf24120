"""Streaming receiver: frame modulation, two-sided dechirp synchronisation
(preamble run detect + downchirp timing/CFO split), and block-wise
processing with carried state."""

import numpy as np
import pytest
import jax

from lora_phy_tpu.models import coded, modem, stream
from lora_phy_tpu.models.coded import CodedConfig
from lora_phy_tpu.ops.impair import apply_awgn, apply_cfo_continuous
from lora_phy_tpu.utils.params import LoraParams


def _frame(p, payload, cfg, preamble_len=8):
    syms = coded.encode_payload(payload, cfg)
    iq = np.asarray(stream.frame_modulate(syms.astype(np.uint16), p,
                                          preamble_len=preamble_len))
    return syms, iq


def test_frame_structure():
    p = LoraParams(sf=7)
    cfg = CodedConfig(sf=7, cr=1)
    payload = np.arange(10, dtype=np.uint8)
    syms, iq = _frame(p, payload, cfg)
    expect = stream.frame_overhead_samples(p, 8) + syms.shape[-1] * p.step
    assert iq.shape[-1] == expect
    np.testing.assert_allclose(np.abs(iq), 1.0, atol=1e-5)


@pytest.mark.parametrize("offset", [0, 5, 137, 300])
def test_frame_sync_offsets(offset):
    """Detection and timing recovery for frames at arbitrary sample
    offsets inside the stream."""
    p = LoraParams(sf=7)
    cfg = CodedConfig(sf=7, cr=1)
    payload = np.arange(10, dtype=np.uint8)
    syms, iq = _frame(p, payload, cfg)
    pad_pre = np.zeros(offset, np.complex64)
    pad_post = np.zeros(3 * p.step, np.complex64)
    sig = np.concatenate([pad_pre, iq, pad_post])

    res = stream.frame_sync(sig, p)
    assert res.found
    assert res.start == offset
    assert res.cfo_bins == 0


def test_frame_demodulate_roundtrip():
    p = LoraParams(sf=7)
    cfg = CodedConfig(sf=7, cr=2)
    payload = np.frombuffer(b"stream-me!", dtype=np.uint8)
    syms, iq = _frame(p, payload, cfg)
    sig = np.concatenate([np.zeros(97, np.complex64), iq,
                          np.zeros(2 * p.step, np.complex64)])
    out, res = stream.frame_demodulate(sig, p, syms.shape[-1])
    assert out is not None
    dec, crc_ok, _ = coded.decode_payload(np.asarray(out.symbols), len(payload), cfg)
    np.testing.assert_array_equal(np.asarray(dec), payload)
    assert bool(np.all(np.asarray(crc_ok)))
    assert int(out.sync_word) == p.sync_word


def test_frame_sync_with_noise_and_cfo():
    """Detection under AWGN and an integer-bin CFO."""
    p = LoraParams(sf=8)
    cfg = CodedConfig(sf=8, cr=1)
    payload = np.arange(12, dtype=np.uint8)
    syms, iq = _frame(p, payload, cfg)
    sig = np.concatenate([np.zeros(3 * p.step, np.complex64), iq,
                          np.zeros(3 * p.step, np.complex64)])
    sig = np.asarray(apply_cfo_continuous(sig, 3.0, p.n, p.osr))
    sig = np.asarray(apply_awgn(jax.random.PRNGKey(5), sig, 20.0))
    res = stream.frame_sync(sig, p)
    assert res.found
    assert res.cfo_bins == 3
    assert abs(res.start - 3 * p.step) <= 2


def test_stream_demodulator_blocks():
    """Two frames at different offsets across multiple feed blocks; both
    recovered with correct absolute positions and payloads."""
    p = LoraParams(sf=7)
    cfg = CodedConfig(sf=7, cr=1)
    pay_a = np.arange(10, dtype=np.uint8)
    pay_b = (np.arange(10, dtype=np.uint8) * 3 + 1).astype(np.uint8)
    syms_a, iq_a = _frame(p, pay_a, cfg)
    syms_b, iq_b = _frame(p, pay_b, cfg)
    gap1, gap2 = 211, 3 * p.step
    sig = np.concatenate([
        np.zeros(gap1, np.complex64), iq_a,
        np.zeros(gap2, np.complex64), iq_b,
        np.zeros(2 * p.step, np.complex64),
    ])

    sd = stream.StreamDemodulator(p, syms_a.shape[-1])
    state = sd.init_state()
    frames = []
    block = 2 * sd.frame_len
    for i in range(0, len(sig), block):
        state, got = sd.process(state, sig[i:i + block])
        frames.extend(got)

    assert len(frames) == 2
    starts = [f[0] for f in frames]
    assert starts[0] == gap1
    assert starts[1] == gap1 + iq_a.size + gap2
    for (start, out), expect in zip(frames, (pay_a, pay_b)):
        dec, crc_ok, _ = coded.decode_payload(
            np.asarray(out.symbols), len(expect), cfg
        )
        np.testing.assert_array_equal(np.asarray(dec), expect)


def test_state_checkpoint_resume(tmp_path):
    """Processing with a save/load mid-stream equals uninterrupted
    processing (checkpoint/resume of the carry pytree)."""
    p = LoraParams(sf=7)
    cfg = CodedConfig(sf=7, cr=1)
    payload = np.arange(9, dtype=np.uint8)
    syms = coded.encode_payload(payload, cfg)
    iq = np.asarray(stream.frame_modulate(syms.astype(np.uint16), p))
    sig = np.concatenate([
        np.zeros(301, np.complex64), iq, np.zeros(2 * p.step, np.complex64),
        np.zeros(150, np.complex64), iq, np.zeros(2 * p.step, np.complex64),
    ])

    sd = stream.StreamDemodulator(p, syms.shape[-1])
    block = 2 * sd.frame_len

    # uninterrupted
    state = sd.init_state()
    ref_frames = []
    for i in range(0, len(sig), block):
        state, got = sd.process(state, sig[i:i + block])
        ref_frames.extend(got)

    # with checkpoint/resume after the first block
    state = sd.init_state()
    state, frames_a = sd.process(state, sig[:block])
    ckpt = tmp_path / "stream_state.npz"
    stream.save_state(state, ckpt)
    state2 = stream.load_state(ckpt)
    frames_b = list(frames_a)
    for i in range(block, len(sig), block):
        state2, got = sd.process(state2, sig[i:i + block])
        frames_b.extend(got)

    assert len(ref_frames) == len(frames_b) == 2
    for (s1, o1), (s2, o2) in zip(ref_frames, frames_b):
        assert s1 == s2
        np.testing.assert_array_equal(np.asarray(o1.symbols), np.asarray(o2.symbols))


def test_frame_demodulate_with_integer_cfo():
    """Integer-bin CFO is detected by the two-sided sync and compensated
    before demodulation; the payload decodes."""
    p = LoraParams(sf=7)
    cfg = CodedConfig(sf=7, cr=2)
    payload = np.frombuffer(b"frame one", dtype=np.uint8)
    syms, iq = _frame(p, payload, cfg)
    sig = np.concatenate([np.zeros(777, np.complex64), iq,
                          np.zeros(1000, np.complex64)])
    sig = np.asarray(apply_cfo_continuous(sig, 2.0, p.n, p.osr))
    out, res = stream.frame_demodulate(sig, p, syms.shape[-1])
    assert res.found and res.cfo_bins == 2
    dec, crc_ok, _ = coded.decode_payload(np.asarray(out.symbols), len(payload), cfg)
    np.testing.assert_array_equal(np.asarray(dec), payload)
    assert bool(np.all(np.asarray(crc_ok)))


def test_adaptive_header_driven_stream():
    """Frames of DIFFERENT payload lengths and coding rates in one
    stream, with no receiver-side prior knowledge: the explicit header
    drives everything."""
    p = LoraParams(sf=8)
    msgs = [(b"short", 1), (b"a much longer payload here!", 4),
            (b"mid-size msg", 2)]
    parts = [np.zeros(313, np.complex64)]
    for payload, cr in msgs:
        cfg = CodedConfig(sf=8, cr=cr)
        iq = np.asarray(stream.frame_encode(
            np.frombuffer(payload, np.uint8), cfg, p))
        parts.append(iq)
        parts.append(np.zeros(500, np.complex64))
    sig = np.concatenate(parts)

    sd = stream.AdaptiveStreamDemodulator(p)
    state = sd.init_state()
    got = []
    block = max(sig.size // 3 + 1, 20 * p.step)
    for i in range(0, sig.size, block):
        state, frames = sd.process(state, sig[i:i + block])
        got.extend(frames)

    assert [g[1] for g in got] == [m[0] for m in msgs]
    for (_, _, info), (_, cr) in zip(got, msgs):
        assert info["header_ok"] and info["crc_ok"]
        assert info["cr"] == cr
        assert info["fec_errors"] == 0


def test_adaptive_stream_under_impairments():
    """Adaptive receiver under AWGN + integer CFO: headers and payloads
    still recover (CR 4/8 frame at 15 dB, 2-bin CFO)."""
    p = LoraParams(sf=8)
    cfg = CodedConfig(sf=8, cr=4)
    payload = b"impaired frame payload"
    iq = np.asarray(stream.frame_encode(np.frombuffer(payload, np.uint8), cfg, p))
    sig = np.concatenate([np.zeros(421, np.complex64), iq,
                          np.zeros(4 * p.step, np.complex64)])
    sig = np.asarray(apply_cfo_continuous(sig, 2.0, p.n, p.osr))
    sig = np.asarray(apply_awgn(jax.random.PRNGKey(11), sig, 15.0))

    got, info, consumed = stream.frame_decode_adaptive(sig, p)
    assert info["found"] and info["header_ok"]
    assert info["cfo_bins"] == 2
    assert got == payload
    assert info["crc_ok"]


def test_preamble_cfo_estimator_accuracy():
    """estimate_preamble_planar recovers injected fractional CFO within
    0.05 bin at 10 dB SNR, for any sync word (the biased sync-pair
    estimator is off by mean(sync bins)/N — e.g. 0.69 bin at 0x8e)."""
    from lora_phy_tpu.models import modem
    from lora_phy_tpu.ops.impair import apply_awgn, apply_cfo_continuous
    from lora_phy_tpu.ops.planar import (_preamble_phase_step,
                                         estimate_preamble_planar)
    import jax

    p = LoraParams(sf=7, sync_word=0x8e)
    pay = np.arange(10, dtype=np.uint8)
    syms = np.asarray(modem.encode(pay), np.int32)
    key = jax.random.PRNGKey(0)
    step_phase = _preamble_phase_step(p.sf, p.osr, p.scale)
    for true_cfo in (-0.31, 0.0, 0.22, 0.47):
        fr0 = np.asarray(stream.frame_modulate(syms, p))
        fr0 = np.asarray(apply_cfo_continuous(fr0, true_cfo, p.n, p.osr))
        # clean-channel accuracy: the estimator must see the channel, not
        # the lattice phase step (which alone aliases it by 0.5 bin)
        sig0 = np.concatenate([np.zeros(300, np.complex64), fr0])
        res0 = stream.frame_sync(sig0, p)
        assert res0.found and res0.start == 300 and res0.cfo_bins == 0
        pre = sig0[res0.start: res0.start + 8 * p.step]
        dech = np.asarray(modem.dechirp(pre, p))
        est = float(np.asarray(estimate_preamble_planar(
            np.ascontiguousarray(dech.real), np.ascontiguousarray(dech.imag),
            p.n, p.osr, phase_step=step_phase)))
        assert abs(est - true_cfo) < 0.02, (true_cfo, est)
        # at 10 dB the scan may trade timing against integer CFO (the two
        # cancel in the dechirped domain) — only the round trip is gated:
        # the streaming demod (which injects the preamble estimate)
        # recovers the payload at this sync word despite the sync-pair
        # estimator's 0.69-bin bias
        sig = np.asarray(apply_awgn(key, sig0, 10.0))
        out, res = stream.frame_demodulate(sig, p, syms.shape[-1])
        assert out is not None
        dec = np.asarray(modem.decode(np.asarray(out.symbols)))
        assert np.array_equal(dec, pay), true_cfo
