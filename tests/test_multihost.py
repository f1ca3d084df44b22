"""Multi-host readiness: a REAL 2-process jax.distributed run on CPU.

Spawns two worker processes (scripts/multihost_worker.py), each owning 4
virtual CPU devices, joined through a localhost coordinator.  The (data,
ctx) mesh spans both processes on the data axis (the DCN axis in a real
multi-pod deployment) and keeps ctx within a process (ICI).  Each worker
feeds its own half of the global batch (jax.make_array_from_process_local_
data) and runs two full STAGE training steps.

Pass criteria: both workers print identical finite losses — the cross-
process gradient psum and the replicated state update agree.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("_TVQA_DRYRUN_FORCE_CPU", None)
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "multihost_worker.py"),
             str(port), str(pid), "2"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for w in workers:
        try:
            out, _ = w.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for x in workers:
                x.kill()
            raise
        outs.append(out)
    for w, out in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, l0, l1 = line.split()
                results[int(pid)] = (float(l0), float(l1))
    assert set(results) == {0, 1}, results
    # replicated state + psum'd grads -> both processes see the same losses
    assert results[0] == results[1], results
    # the second step actually updated the params
    assert results[0][0] != results[0][1], results
