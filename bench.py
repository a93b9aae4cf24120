#!/usr/bin/env python3
"""Headline benchmark: batched multi-channel LoRa demodulation throughput.

Workload (a superset of BASELINE.json configs[3]'s 8x1024): 8 channels x
8192 frames of 32-byte payloads at SF7 BW125 osr1 -> 66 symbols x 128
samples = 8448 IQ samples per frame, 554M IQ samples per step,
demodulated through the full working path (normalisation, 2-symbol CFO/TO estimate with deterministic
tie-breaks, shifted gather, derotation, MXU DFT, argmax, sync extraction).

Runs the planar float32 pipeline — the TPU deployment path (this image's
TPU PJRT implements no complex64; planar split re/im is the TPU-native
layout regardless).

Baseline: the reference's single-core C++ loop demodulates ~2.01e7 IQ
samples/s (BASELINE.md, derived from logs/performance_run2.csv SF7 row:
2377.87 pps x 66 symbols x 128 samples).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_IQ_SAMPLES_PER_S = 2377.87 * 66 * 128  # ~2.009e7 (BASELINE.md)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from lora_phy_tpu.models import modem
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.utils.params import LoraParams

    platform = jax.default_backend()
    log(f"platform: {platform} devices: {jax.devices()}")

    params = LoraParams(sf=7)
    payload_len = 32
    n_sym = payload_len * 2 + 2                      # 66 incl. sync
    frame_samples = n_sym * params.step              # 8448
    # full-size batch on an accelerator (8192 frames/channel amortises the
    # fixed per-dispatch overhead of this image's relayed PJRT); small batch
    # if this ever runs on a CPU fallback so the bench still completes
    channels, frames = (8, 8192) if platform != "cpu" else (8, 64)

    # Build a distinct pool of frames on CPU and tile it — demod cost is
    # data-independent, generation stays cheap and off the bench clock.
    cpu = jax.devices("cpu")[0]
    rng = np.random.RandomState(0)
    pool = 64
    payloads = rng.randint(0, 256, (pool, payload_len)).astype(np.uint8)
    with jax.default_device(cpu):
        syms = modem.encode(payloads)
        iq = modem.modulate(syms, params)
        dech = np.asarray(modem.dechirp(iq, params)).astype(np.complex64)
    xr_pool, xi_pool = planar.split_complex(dech)     # [pool, frame_samples]

    dev = jax.devices()[0]
    # upload only the small pool (the relayed h2d path here is slow);
    # materialize the full batch on-device with a jitted tile
    import jax.numpy as jnp

    reps = (channels * frames) // pool

    @jax.jit
    def expand(a):
        return jnp.tile(a, (reps, 1)).reshape(channels, frames, frame_samples)

    xr_d = expand(jax.device_put(xr_pool, dev))
    xi_d = expand(jax.device_put(xi_pool, dev))

    fused = os.environ.get("LORA_BENCH_FUSED", "0") == "1"

    def step(r, i):
        res = planar.demodulate_planar(r, i, params, fused=fused)
        return res.symbols, res.sync_word

    jstep = jax.jit(step)

    # NOTE on methodology: this PJRT's block_until_ready does not wait for
    # real completion (verified: impossible TFLOP readings); a tiny
    # device-to-host transfer of the result is used as the completion
    # barrier instead. Large d2h transfers ride a slow relay here, so the
    # sanity check moves only a small slice.
    t0 = time.perf_counter()
    out = jstep(xr_d, xi_d)
    first_syms = np.asarray(out[0][0, :pool])    # small d2h, forces completion
    log(f"compile+upload+first step: {time.perf_counter() - t0:.2f}s")

    # sanity: decoded payloads must match bit-exactly
    with jax.default_device(cpu):
        decoded = np.asarray(modem.decode(first_syms))
    assert np.array_equal(decoded, payloads), "bench demod mismatch"
    assert np.all(np.asarray(out[1][:2]) == params.sync_word)

    iters = 8
    np.asarray(jstep(xr_d, xi_d)[0][0, 0, :2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jstep(xr_d, xi_d)
        np.asarray(out[0][0, 0, :2])             # completion barrier
    dt = (time.perf_counter() - t0) / iters

    total_samples = channels * frames * frame_samples
    sps = total_samples / dt
    log(
        f"demod: {total_samples/1e6:.1f}M IQ samples in {dt*1e3:.1f} ms "
        f"-> {sps/1e9:.3f} Gsamples/s ({sps/BASELINE_IQ_SAMPLES_PER_S:.0f}x baseline)"
    )

    # secondary: SF12 (N=4096, four-step DFT path), stderr only
    try:
        p12 = LoraParams(sf=12)
        with jax.default_device(cpu):
            s12 = modem.encode(payloads[:4])
            d12 = np.asarray(
                modem.dechirp(modem.modulate(s12, p12), p12)
            ).astype(np.complex64)
        r12, i12 = planar.split_complex(d12)
        reps12 = 256   # 1024 frames -> 277M samples, amortises dispatch

        @jax.jit
        def expand12(a):
            return jnp.tile(a, (reps12, 1))

        xr12 = expand12(jax.device_put(r12, dev))
        xi12 = expand12(jax.device_put(i12, dev))
        j12 = jax.jit(lambda r, i: planar.demodulate_planar(r, i, p12).symbols)
        np.asarray(j12(xr12, xi12)[0, :2])
        t0 = time.perf_counter()
        for _ in range(4):
            o12 = j12(xr12, xi12)
            np.asarray(o12[0, :2])
        dt12 = (time.perf_counter() - t0) / 4
        n12 = xr12.shape[0] * xr12.shape[1]
        base12 = 65.8583 * 66 * 4096      # reference SF12 row, BASELINE.md
        log(
            f"secondary SF12: {n12/1e6:.1f}M samples in {dt12*1e3:.1f} ms "
            f"-> {n12/dt12/1e9:.3f} Gsamples/s "
            f"({n12/dt12/base12:.0f}x reference SF12)"
        )
    except Exception as e:  # secondary metric must never break the bench
        log(f"secondary SF12 skipped: {e}")

    print(json.dumps({
        "metric": "demod_iq_throughput_sf7",
        "value": round(sps, 0),
        "unit": "IQ samples/s",
        "vs_baseline": round(sps / BASELINE_IQ_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
