"""Multi-PROCESS dryrun artifact (the multihost twin of MULTICHIP_r*.json).

Runs the same STAGE training steps three ways on virtual CPU devices:

* 2 processes x 4 devices through a real jax.distributed cluster
  (scripts/multihost_worker.py; data axis spans processes = the DCN axis,
  ctx stays within a process = ICI), each feeding its own half of the
  global batch;
* 1 process x 4 devices through the same worker (same global batch, same
  mesh recipe) — the single-process baseline.

Pass criteria (asserted, then written to MULTIHOST_r05.json):
* the two distributed workers report bit-identical finite losses (the
  cross-process gradient psum + replicated state update agree);
* the 2-process losses match the 1-process losses to f32 tolerance (the
  DCN-axis all-reduce computes the same global gradient).

Usage: python scripts/dryrun_multihost.py [out.json]
"""
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cluster(nproc):
    port = free_port()
    env = dict(os.environ)
    env.pop("_TVQA_DRYRUN_FORCE_CPU", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "multihost_worker.py"),
             str(port), str(pid), str(nproc)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed (nproc={nproc}):\n"
                               f"{out[-4000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, l0, l1 = line.split()
                results[int(pid)] = (float(l0), float(l1))
    assert len(results) == nproc, results
    return results


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "MULTIHOST_r05.json")
    two = run_cluster(2)
    one = run_cluster(1)
    assert two[0] == two[1], f"worker losses diverged: {two}"
    assert two[0][0] != two[0][1], "step 2 did not update params"
    deltas = [abs(a - b) for a, b in zip(two[0], one[0])]
    assert max(deltas) < 1e-4, \
        f"2-process vs 1-process loss mismatch: {two[0]} vs {one[0]}"
    record = {
        "ok": True,
        "mesh": "data=2*nproc (spans processes / DCN), ctx=2 (in-process)",
        "global_batch": 8,
        "losses_2proc": list(two[0]),
        "losses_1proc": list(one[0]),
        "max_abs_delta_vs_single_process": max(deltas),
        "workers_bit_identical": True,
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
