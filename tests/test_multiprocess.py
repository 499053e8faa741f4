"""Multi-process (DCN stand-in) data-parallel smoke test.

Spawns two real OS processes, each exposing 2 virtual CPU devices, joined
into one jax.distributed cluster over a localhost coordinator with gloo
cross-process collectives — the CPU analog of two TPU hosts on DCN. One
flagship train step runs over the global 4-device mesh; both processes
must observe the SAME replicated loss, proving the gradient all-reduce
crossed the process boundary (the multi-host generalization of the
reference's single-process DataParallel, reference train.py:205).

Also a regression test: initialize_distributed used to probe
``jax.process_count()`` first, which initializes the backend and makes
``jax.distributed.initialize`` fail — silently degrading an explicit
2-process request to two disconnected 1-process runs (the workers would
then read different losses and this test fails).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow  # two processes timeshare this box's one core (~3 min)
def test_two_process_dp_train_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=REPO, env=env)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MPOK process=\d loss=([0-9.]+)", out)
        assert m, f"no MPOK line:\n{out[-3000:]}"
        losses.append(float(m.group(1)))
    # identical replicated loss on both hosts == the all-reduce crossed DCN
    assert losses[0] == losses[1], losses

    # cross-process SERVING step (VERDICT r3 #8): the global checksum over
    # the batch-sharded dual-eye outputs must agree bitwise on both hosts —
    # each process fed only its local frame slice, so agreement proves the
    # serving outputs crossed the process boundary
    serves = []
    for out in outs:
        m = re.search(r"MPSERVE process=\d checksum=(-?[0-9.]+) "
                      r"segsum=(\d+)", out)
        assert m, f"no MPSERVE line:\n{out[-3000:]}"
        serves.append((float(m.group(1)), int(m.group(2))))
    assert serves[0] == serves[1], serves


def test_explicit_coordinator_failure_raises():
    """An explicit multi-process request that cannot initialize must raise,
    not silently degrade to a single-process run (training on 1/N of the
    fleet). Runs in a subprocess: jax.distributed state is process-global."""
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from eghmd_tpu.parallel.mesh import initialize_distributed\n"
        "try:\n"
        "    initialize_distributed(coordinator_address='localhost:1')\n"
        "except (RuntimeError, ValueError):\n"
        "    print('RAISED-AS-REQUIRED')\n"
        "else:\n"
        "    print('SILENT-DEGRADE')\n"
        "initialize_distributed()  # auto-resolve: must stay a quiet no-op\n"
        "print('AUTO-OK')\n" % REPO
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=REPO, env=env, timeout=300)
    assert "RAISED-AS-REQUIRED" in out.stdout, out.stdout + out.stderr
    assert "AUTO-OK" in out.stdout, out.stdout + out.stderr
