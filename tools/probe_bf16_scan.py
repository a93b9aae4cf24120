"""Probe: bf16 DFT output in the frame-sync scan's decision core.

VERDICT (measured, CPU probe): DISQUALIFIED — clean-stream scan
decisions already differ (valid/start flips on marginal windows: the
run-equality, down-dominance and concentration gates are threshold
comparisons where the bf16 spectrum grid moves borderline windows).
The demod's bf16 spectrum survives because its only consumer is a
per-window argmax; the scan's consumers are cross-window comparisons.
Kept as the documented negative result — don't redo.

The scan's stacked up/down dechirp DFT is the front 2.4 ms of the block
receiver; its spectrum write+read is ~0.8 GB f32 at the bench shape.
This A/Bs a bf16-spectrum variant of the scan's hot call
(`argmax_bins_planar` with peaks) and checks FULL SyncScan decision
equality (valid/start/cfo_bins bit-equal) on the bench stream plus a
noisy copy — peaks feed dB thresholds, so equality matters more here
than in the demod.

    python tools/probe_bf16_scan.py
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

    from lora_phy_tpu.models import modem, sync
    from lora_phy_tpu.models import stream as streammod
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.planar import _combined_dft_mat
    from lora_phy_tpu.utils.params import LoraParams

    on_cpu = jax.default_backend() == "cpu"
    params = LoraParams(sf=7)
    channels = 8
    fpc = 512 if not on_cpu else 8
    pl_len = 16
    gap = 4 * params.step
    rng = np.random.RandomState(0)
    pay = rng.randint(0, 256, (channels, pl_len)).astype(np.uint8)
    dev = jax.devices()[0]

    @jax.jit
    def framed(pl):
        syms = modem.encode(pl)
        fr, fi = streammod.frame_modulate_planar(syms, params)
        z = jnp.zeros((channels, gap), jnp.float32)
        return (jnp.tile(jnp.concatenate([fr, z], -1), (1, fpc)),
                jnp.tile(jnp.concatenate([fi, z], -1), (1, fpc)))

    br, bi = framed(jax.device_put(pay, dev))
    np.asarray(br[0, :2])
    n = params.n

    def scan_f32(r, i):
        return sync.frame_sync_scan_planar(r, i, params,
                                           min_power_db=-30.0)

    # bf16 variant: monkeypatch-free inline of the scan's decision core
    # is invasive; instead patch argmax_bins_planar via a local module
    # switcheroo for the probe only
    orig = planar.argmax_bins_planar

    def argmax_bf16(xr, xi, nn, mxu_dtype=None, with_peak=False):
        if nn > 128 or mxu_dtype is not None:
            return orig(xr, xi, nn, mxu_dtype, with_peak)
        f = jnp.concatenate([xr, xi], axis=-1)
        m = jnp.asarray(_combined_dft_mat(nn)).astype(jnp.bfloat16)
        y = jnp.matmul(f.astype(jnp.bfloat16), m,
                       preferred_element_type=jnp.bfloat16)
        a = y[..., :nn].astype(jnp.float32)
        b = y[..., nn:].astype(jnp.float32)
        mag2 = a * a + b * b
        bins = jnp.argmax(mag2, axis=-1).astype(jnp.int32)
        if with_peak:
            return bins, jnp.max(mag2, axis=-1)
        return bins

    def scan_bf16(r, i):
        import lora_phy_tpu.models.sync as syncmod
        old = syncmod.argmax_bins_planar
        syncmod.argmax_bins_planar = argmax_bf16
        try:
            syncmod.frame_sync_scan_planar.clear_cache()
            out = syncmod.frame_sync_scan_planar(r, i, params,
                                                 min_power_db=-30.0)
        finally:
            syncmod.argmax_bins_planar = old
            syncmod.frame_sync_scan_planar.clear_cache()
        return out

    s1 = scan_f32(br, bi)
    np.asarray(s1.valid[0, :2])
    s2 = scan_bf16(br, bi)
    np.asarray(s2.valid[0, :2])
    same = (np.array_equal(np.asarray(s1.valid), np.asarray(s2.valid))
            and np.array_equal(np.asarray(s1.start), np.asarray(s2.start))
            and np.array_equal(np.asarray(s1.cfo_bins),
                               np.asarray(s2.cfo_bins)))
    print(f"clean scan decisions equal: {same}", file=sys.stderr, flush=True)

    @jax.jit
    def noisy(r, i, k):
        kr, ki = jax.random.split(k)
        s = jnp.float32(10 ** (-6.0 / 20.0) / np.sqrt(2))
        return (r + s * jax.random.normal(kr, r.shape, jnp.float32),
                i + s * jax.random.normal(ki, i.shape, jnp.float32))

    nr, ni = noisy(br, bi, jax.random.PRNGKey(1))
    v1 = scan_f32(nr, ni)
    np.asarray(v1.valid[0, :2])
    # count decision differences under noise
    nv1 = np.asarray(v1.valid)
    st1 = np.asarray(v1.start)
    v2 = scan_bf16(nr, ni)
    nv2 = np.asarray(v2.valid)
    st2 = np.asarray(v2.start)
    dv = int((nv1 != nv2).sum())
    ds = int(((st1 != st2) & nv1 & nv2).sum())
    print(f"noisy (-6 dB): valid diffs {dv}, start diffs {ds} "
          f"of {nv1.sum()} valids", file=sys.stderr, flush=True)

    iters = 24 if not on_cpu else 2
    for name, f in (("scan f32 (committed)", scan_f32),):
        out = f(br, bi)
        np.asarray(out.valid[0, :2])
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(br, bi)
            np.asarray(out.valid[0, :2])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name:24s} {best*1e3:7.2f} ms "
              f"({br.size*2/best/1e9:.2f} Gsps)", file=sys.stderr, flush=True)
    # bf16 timing: patch once, jit once, time
    import lora_phy_tpu.models.sync as syncmod
    syncmod.argmax_bins_planar = argmax_bf16
    syncmod.frame_sync_scan_planar.clear_cache()
    try:
        out = syncmod.frame_sync_scan_planar(br, bi, params,
                                             min_power_db=-30.0)
        np.asarray(out.valid[0, :2])
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = syncmod.frame_sync_scan_planar(br, bi, params,
                                                     min_power_db=-30.0)
            np.asarray(out.valid[0, :2])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{'scan bf16-spectrum':24s} {best*1e3:7.2f} ms "
              f"({br.size*2/best/1e9:.2f} Gsps)", file=sys.stderr, flush=True)
    finally:
        syncmod.argmax_bins_planar = orig
        syncmod.frame_sync_scan_planar.clear_cache()


if __name__ == "__main__":
    main()
