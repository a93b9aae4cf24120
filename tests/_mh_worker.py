"""Worker process for the real multi-process distributed test
(tests/test_multihost.py). Each process owns half of the time axis of a
continuous stream, joins the jax.distributed runtime, builds the global
(channel, time) mesh spanning both processes, runs the planar streaming
demodulator (cross-process ppermute halos + psum broadcast), and checks
bit-parity against the locally-computed single-device reference.

Usage: python tests/_mh_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

proc_id, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=4"]
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lora_phy_tpu.models import modem  # noqa: E402
from lora_phy_tpu.ops import planar  # noqa: E402
from lora_phy_tpu.parallel import mesh as meshlib  # noqa: E402
from lora_phy_tpu.parallel import multihost  # noqa: E402
from lora_phy_tpu.parallel.stream import demodulate_stream_planar  # noqa: E402
from lora_phy_tpu.utils.params import LoraParams  # noqa: E402


def main() -> int:
    multihost.initialize(coordinator_address=coord, num_processes=nproc,
                         process_id=proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    p = LoraParams(sf=7)
    n_channels = 2
    rng = np.random.RandomState(7)  # same data in every process
    payloads = rng.randint(0, 256, (n_channels, 31)).astype(np.uint8)
    syms_tx = modem.encode(payloads)
    re, im = planar.modulate_planar(syms_tx, p)
    dr, di = planar.dechirp_planar(re, im, p)
    dr, di = np.asarray(dr), np.asarray(di)

    # global mesh across both processes; the time axis spans processes so
    # the halo ppermute and the estimate psum cross the process boundary
    m = meshlib.make_mesh(n_channel=1, n_time=4 * nproc)

    t_total = dr.shape[-1]
    t_local = t_total // nproc
    sl = slice(proc_id * t_local, (proc_id + 1) * t_local)
    xr = multihost.global_stream_array(m, dr[:, sl])
    xi = multihost.global_stream_array(m, di[:, sl])
    assert xr.shape == (n_channels, t_total)

    out_syms, sync, cfo, to = demodulate_stream_planar(xr, xi, p, m)

    # single-device reference, computed locally from the full stream
    ref = modem.demodulate(
        (dr + 1j * di).astype(np.complex64), p
    )

    from jax.experimental import multihost_utils

    all_syms = np.asarray(multihost_utils.process_allgather(
        out_syms, tiled=True
    ))
    all_sync = np.asarray(multihost_utils.process_allgather(sync, tiled=True))
    np.testing.assert_array_equal(all_syms[:, 2:], np.asarray(ref.symbols))
    np.testing.assert_array_equal(all_sync, np.asarray(ref.sync_word))
    decoded = np.asarray(modem.decode(all_syms[:, 2:]))
    np.testing.assert_array_equal(decoded, payloads)

    print(f"PARITY OK process {proc_id}/{nproc}", flush=True)

    # --- frame-SYNC scan receiver across the real process boundary: a
    # frame STRADDLING the inter-process seam is claimed exactly once,
    # its right halo ppermuted across the process boundary (the DCN
    # stand-in for the flagship scan path, not just the demod) ---------
    from lora_phy_tpu.models import stream as streammod
    from lora_phy_tpu.parallel.stream import receive_stream_block_planar

    n_pay = 8
    frame_len = (streammod.frame_overhead_samples(p)
                 + n_pay * p.step)
    t_mesh = 4 * nproc
    total = 4096 * t_mesh
    pl_a = rng.randint(0, 256, n_pay // 2).astype(np.uint8)
    pl_b = rng.randint(0, 256, n_pay // 2).astype(np.uint8)
    sr = np.zeros((1, total), np.float32)
    si = np.zeros((1, total), np.float32)
    placed = {}
    for pl, off in ((pl_a, 500),
                    (pl_b, total // nproc - frame_len // 2)):
        fr, fi = streammod.frame_modulate_planar(
            np.asarray(modem.encode(pl), np.int32), p)
        sr[0, off: off + frame_len] = np.asarray(fr)
        si[0, off: off + frame_len] = np.asarray(fi)
        placed[off] = pl
    t_loc = total // nproc
    ssl = slice(proc_id * t_loc, (proc_id + 1) * t_loc)
    gxr = multihost.global_stream_array(m, sr[:, ssl])
    gxi = multihost.global_stream_array(m, si[:, ssl])
    blk = receive_stream_block_planar(gxr, gxi, p, n_pay, m, max_frames=2)
    gf = np.asarray(multihost_utils.process_allgather(blk.found,
                                                      tiled=True))
    gs = np.asarray(multihost_utils.process_allgather(blk.start,
                                                      tiled=True))
    gsym = np.asarray(multihost_utils.process_allgather(blk.symbols,
                                                        tiled=True))
    ks = np.flatnonzero(gf[0])
    got = {int(gs[0, k]): np.asarray(modem.decode(gsym[0, k])) for k in ks}
    assert set(got) == set(placed), (sorted(got), sorted(placed))
    for off, pl in placed.items():
        np.testing.assert_array_equal(got[off], pl)
    print(f"SCAN OK process {proc_id}/{nproc} "
          f"(frame straddles the process seam at {total // nproc})",
          flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
