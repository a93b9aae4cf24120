"""Real multi-process distributed validation (SURVEY.md §5.8): two local
processes join via jax.distributed (CPU backend, localhost coordinator),
build one global (channel, time) mesh over 8 devices (4 per process), and
run the planar streaming demodulator with cross-process halo exchange —
asserting bit-parity with the single-device path.

This executes multihost.initialize / global_stream_array for real (they
are pass-throughs, but the collectives they feed cross an actual process
boundary here — the single-host stand-in for ICI/DCN scale-out)."""

import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_stream_parity():
    repo = pathlib.Path(__file__).resolve().parents[1]
    worker = repo / "tests" / "_mh_worker.py"
    coord = f"localhost:{_free_port()}"
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(nproc), coord],
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for i, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out")
        outs.append((proc.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{err[-3000:]}"
        assert f"PARITY OK process {i}/{nproc}" in out
        assert f"SCAN OK process {i}/{nproc}" in out
