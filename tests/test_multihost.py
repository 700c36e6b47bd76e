"""Multi-host scaffold: the sharded protocol across PROCESS boundaries.

The in-process 8-device mesh tier (test_sharding.py, dryrun_multichip)
proves the collective structure; this tier proves the multi-controller
runtime story: two separate processes, each owning 4 virtual CPU
devices, join via jax.distributed, build one global (1, 8) mesh, run the
sharded ctr setup (hint psums cross the process boundary over gloo — on
a TPU pod the identical program reduces over ICI/DCN), broadcast a
client query from process 0, and answer it with a collective respond.
The reference has no multi-node capability at all (SURVEY.md section 2),
so this is exceed-parity surface.
"""

import socket
import subprocess
import sys



def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_round_trip():
    # bounded by the subprocess timeout below (pytest-timeout not installed)
    port = _free_port()
    proc = subprocess.run(
        [
            sys.executable, "-m", "chalametpir_tpu.parallel.multihost_demo",
            "--launch", "2", "--coordinator", f"127.0.0.1:{port}",
            "--entries", "300",
        ],
        capture_output=True, text=True, timeout=280,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"multihost demo failed:\n{out[-3000:]}"
    assert "MULTIHOST OK" in out, f"no MULTIHOST OK in output:\n{out[-3000:]}"
