"""Two-process jax.distributed smoke test (VERDICT r2 missing #5).

``parallel.mesh.initialize_multihost`` had never been initialized anywhere;
this spawns two local processes (2 virtual CPU devices each), forms the
4-device GLOBAL mesh, and runs a real sharded coarse train step with each
process feeding its local batch shard — the DCN growth path of SURVEY §2.5
exercised end-to-end without pod hardware. Both processes must report the
same loss/grad-norm (the gradient all-reduce crossed the process boundary).
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(nproc), str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT (\d+) loss=(\S+) gnorm=(\S+) devices=(\d+)", out)
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)),
                                    int(m.group(4)))
    assert set(results) == {0, 1}
    (l0, g0, d0), (l1, g1, d1) = results[0], results[1]
    assert d0 == d1 == 4
    # replicated state + cross-process all-reduce => identical metrics
    assert l0 == pytest.approx(l1, rel=1e-5)
    assert g0 == pytest.approx(g1, rel=1e-5)

    # sharded sampling: each process fed its local mask shard; the
    # allgathered global sample must be finite and identical in both
    samples = {}
    for out in outs:
        m = re.search(r"SAMPLE (\d+) ok=(\d) checksum=(\S+)", out)
        assert m, f"no SAMPLE line in:\n{out}"
        samples[int(m.group(1))] = (int(m.group(2)), float(m.group(3)))
    assert samples[0][0] == 1 and samples[1][0] == 1
    assert samples[0][1] == pytest.approx(samples[1][1], rel=1e-6)
