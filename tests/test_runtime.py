"""Native C++ runtime: format conversion, overlap-save ring, file ingest."""

import numpy as np
import pytest

runtime = pytest.importorskip("lora_phy_tpu.runtime")


@pytest.fixture(scope="module", autouse=True)
def built():
    try:
        runtime.lib()
    except Exception as e:  # no compiler in env
        pytest.skip(f"native runtime unavailable: {e}")


def test_cf32_roundtrip():
    rng = np.random.RandomState(0)
    inter = rng.randn(256).astype(np.float32)
    re, im = runtime.to_planar(inter)
    np.testing.assert_array_equal(re, inter[0::2])
    np.testing.assert_array_equal(im, inter[1::2])
    back = runtime.from_planar(re, im)
    np.testing.assert_array_equal(back, inter)


def test_int16_scaling():
    x = np.array([32767, -32768, 16384, 0], dtype=np.int16)
    re, im = runtime.to_planar(x, scale=1.0)
    np.testing.assert_allclose(re, [32767 / 32768.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(im, [-1.0, 0.0], atol=1e-6)


def test_int8():
    x = np.array([127, -128, 64, 32], dtype=np.int8)
    re, im = runtime.to_planar(x, scale=1.0)
    np.testing.assert_allclose(re, [127 / 128.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(im, [-1.0, 0.25], atol=1e-6)


def test_ring_blocks_and_halo():
    ring = runtime.OverlapSaveRing(capacity=1024, block=128, halo=16)
    stream = np.arange(400, dtype=np.float32)
    pushed = ring.push(stream, -stream)
    assert pushed == 400
    assert ring.ready == 400

    # first block: halo is zero fill (before stream start)
    re, im = ring.pop_block()
    np.testing.assert_array_equal(re[:16], np.zeros(16))
    np.testing.assert_array_equal(re[16:], stream[:128])
    np.testing.assert_array_equal(im[16:], -stream[:128])
    assert ring.position == 128

    # second block: halo = last 16 samples of block one
    re2, _ = ring.pop_block()
    np.testing.assert_array_equal(re2[:16], stream[112:128])
    np.testing.assert_array_equal(re2[16:], stream[128:256])

    re3, _ = ring.pop_block()
    np.testing.assert_array_equal(re3[16:], stream[256:384])
    # not enough for a fourth block
    assert ring.pop_block() is None


def test_ring_backpressure():
    ring = runtime.OverlapSaveRing(capacity=256, block=64, halo=8)
    big = np.zeros(1000, np.float32)
    pushed = ring.push(big, big)
    # the halo behind the consume point is reserved for the next pop
    assert pushed == 256 - 8
    ring.pop_block()
    assert ring.space == 64


def test_ring_full_refill_across_wrap_keeps_halo():
    """Producer refills ALL available space between pops across wraps; the
    halo of every block must still be the previous block's tail samples
    (regression: an unreserved halo region gets overwritten when full)."""
    cap, block, halo = 256, 64, 8
    ring = runtime.OverlapSaveRing(capacity=cap, block=block, halo=halo)
    total = np.arange(4096, dtype=np.float32)
    fed = 0
    popped = 0
    while fed < total.size or ring.ready >= block:
        space = ring.space
        if space and fed < total.size:
            fed += ring.push(total[fed:fed + space], -total[fed:fed + space])
        blk = ring.pop_block()
        if blk is None:
            assert fed >= total.size
            break
        re, im = blk
        start = popped * block
        if popped > 0:
            np.testing.assert_array_equal(re[:halo], total[start - halo:start])
            np.testing.assert_array_equal(im[:halo], -total[start - halo:start])
        np.testing.assert_array_equal(re[halo:], total[start:start + block])
        popped += 1
    assert popped >= 60  # many wraps of the 256-sample ring


def test_ring_wraparound_consistency():
    ring = runtime.OverlapSaveRing(capacity=300, block=100, halo=10)
    total = np.arange(1000, dtype=np.float32)
    fed = 0
    out = []
    while fed < 1000 or ring.ready >= 100:
        if fed < 1000:
            fed += ring.push(total[fed:fed + 50], total[fed:fed + 50])
        blk = ring.pop_block()
        if blk is not None:
            out.append(blk[0][10:])
    joined = np.concatenate(out)
    np.testing.assert_array_equal(joined, total[: len(joined)])
    assert len(joined) >= 900


def test_read_iq_file(tmp_path):
    from lora_phy_tpu.utils.iqio import write_iq

    x = (np.arange(64) - 1j * np.arange(64)).astype(np.complex64)
    path = tmp_path / "x.iq"
    write_iq(path, x)
    re, im = runtime.read_iq_file(path)
    np.testing.assert_array_equal(re, x.real)
    np.testing.assert_array_equal(im, x.imag)
    re2, im2 = runtime.read_iq_file(path, offset_samples=10, n_samples=20)
    np.testing.assert_array_equal(re2, x.real[10:30])


def test_streaming_demod_via_native_ring():
    """End-to-end: native ring feeds planar blocks into the JAX demod."""
    from lora_phy_tpu.models import modem
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.utils.params import LoraParams

    p = LoraParams(sf=7)
    payload = np.arange(16, dtype=np.uint8)
    syms = modem.encode(payload)
    iq = modem.modulate(syms, p)
    dech = np.asarray(modem.dechirp(iq, p))
    re, im = dech.real.astype(np.float32).copy(), dech.imag.astype(np.float32).copy()

    ring = runtime.OverlapSaveRing(capacity=re.size * 2, block=re.size, halo=p.step)
    ring.push(re, im)
    blk = ring.pop_block()
    assert blk is not None
    xr, xi = blk[0][p.step:], blk[1][p.step:]
    res = planar.demodulate_planar(xr, xi, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)
