"""2-process `jax.distributed` smoke test (CPU, Gloo collectives).

Proves the `--multihost` path (cli/main_contrast.py: jax.distributed
.initialize, the reference's multi-node DDP analog, base_trainer.py:20-73)
beyond a flag: two controller processes each feed their local batch half
through `shard_batch` and run the SAME global flagship train step; both must
report the identical loss and memory-bank state.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_agrees():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(ROOT, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=ROOT)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
            assert p.returncode == 0, f"worker failed:\n{out}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) loss=([-\d.]+) bank=([-\d.]+)", out)
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    l0, b0 = results[0]
    l1, b1 = results[1]
    assert l0 == pytest.approx(l1, rel=1e-6)
    assert b0 == pytest.approx(b1, rel=1e-6)
    import math
    assert math.isfinite(l0)
