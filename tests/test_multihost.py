"""Multi-host DP path test (VERDICT.md round-1 item 6; SURVEY.md §2.4).

Two local processes rendezvous through ``jax.distributed.initialize`` on a
localhost coordinator (CPU backend, 2 devices each) and run the SAME
device-feed DP program as a 4-device single process.  SPMD contract: final
params bit-match across processes AND across modes — a typo in
init_distributed/make_mesh that would only surface on a real pod surfaces
here instead.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "dist_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(args, timeout=600):
    env = {**os.environ, "PYTHONPATH": _REPO}
    return subprocess.run([sys.executable, _WORKER, *args],
                          capture_output=True, text=True, timeout=timeout,
                          env=env, cwd=_REPO)


def _digest(proc):
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    for line in proc.stdout.splitlines():
        if line.startswith("DIGEST "):
            return json.loads(line[len("DIGEST "):])
    raise AssertionError(f"no DIGEST line in: {proc.stdout[-2000:]}")


def test_two_process_dp_matches_single_process():
    port = str(_free_port())
    multi = [subprocess.Popen(
        [sys.executable, _WORKER, "multi", "2", port, str(pid), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**os.environ, "PYTHONPATH": _REPO}, cwd=_REPO)
        for pid in (0, 1)]
    outs = []
    for p in multi:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in multi:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    single = _run(["single", "4", port, "0", "1"])

    digs = []
    for rc, out, err in outs:
        assert rc == 0, (out[-2000:], err[-2000:])
        for line in out.splitlines():
            if line.startswith("DIGEST "):
                digs.append(json.loads(line[len("DIGEST "):]))
    assert len(digs) == 2, outs
    d_single = _digest(single)

    # bit-exact across the two processes of the multi run
    assert digs[0]["digest"] == digs[1]["digest"]
    assert digs[0]["d_loss"] == digs[1]["d_loss"]
    # and bit-exact vs the single-process 4-device run of the same program
    assert digs[0]["digest"] == d_single["digest"]
    assert digs[0]["d_loss"] == d_single["d_loss"]
