#!/usr/bin/env python3
"""Measure (a) the current d2h sync-roundtrip constant and (b) the
block receiver's per-iter asymptote vs the iteration count used to
amortize that constant.

Why: bench.py's ``_timeit`` performs ONE tiny d2h transfer per timed
batch (the only real completion barrier on this PJRT, CLAUDE.md) and
divides by ``iters`` — so every per-iter number carries a ``+c/iters``
term where ``c`` is the roundtrip. Round 3 measured c ~ 27-30 ms; at
the block-rx stage's 24 iters that is ~1.25 ms on an ~8.7 ms program
(14%!). This probe measures c directly and sweeps iters in
{12, 24, 48, 96} to expose the asymptote, so the bench's iteration
counts can be chosen to keep the artifact under a few percent — and so
the committed throughput numbers mean "sustained streaming rate", not
"rate plus a fixed relay latency tax".

Usage: python tools/probe_iter_asymptote.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    # startup watchdog (CLAUDE.md: wedged claims hang in C; healthy
    # claims can still take ~6 min — never SIGTERM mid-claim)
    import os
    import threading

    def _dead():
        print("TPU startup timed out", file=sys.stderr, flush=True)
        os._exit(1)

    watchdog = threading.Timer(540.0, _dead)
    watchdog.daemon = True
    watchdog.start()

    import jax
    import jax.numpy as jnp

    from lora_phy_tpu.models import modem
    from lora_phy_tpu.models import stream as streammod
    from lora_phy_tpu.models import sync as syncmod
    from lora_phy_tpu.utils.params import LoraParams

    dev = jax.devices()[0]
    x = jax.device_put(np.arange(256, dtype=np.float32), dev)
    y = jax.jit(lambda a: a * 2.0)(x)
    np.asarray(y[:2])
    watchdog.cancel()
    print(f"platform: {jax.default_backend()}", file=sys.stderr, flush=True)

    # --- (a) pure d2h roundtrip: tiny transfer of an already-computed
    # buffer, back to back ------------------------------------------------
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(y[:2])
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"d2h tiny roundtrip: min {ts.min():.2f} ms  "
          f"median {np.median(ts):.2f} ms  max {ts.max():.2f} ms",
          flush=True)

    # --- (b) block receiver per-iter vs iters ----------------------------
    params = LoraParams(sf=7)
    channels, pl_len, fpc = 8, 16, 512
    n_pay = pl_len * 2
    gap = 4 * params.step
    rng = np.random.RandomState(0)
    pay_blk = rng.randint(0, 256, (channels, pl_len)).astype(np.uint8)

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

    @jax.jit
    def block_rx(r, i):
        return syncmod.receive_block_planar(
            r, i, params, n_pay, max_frames=fpc, min_power_db=-30.0)

    blk = block_rx(br, bi)
    np.asarray(blk.found[0, :2])

    print(f"{'iters':>6} {'ms/iter':>9} {'Gsps':>7}", flush=True)
    for iters in (12, 24, 48, 96):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                blk = block_rx(br, bi)
            np.asarray(blk.found[0, :2])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{iters:>6} {best*1e3:9.2f} {total/best/1e9:7.3f}",
              flush=True)


if __name__ == "__main__":
    main()
