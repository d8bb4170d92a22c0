"""Multi-process distributed tests (SURVEY.md §2.5 communication backend,
§4 multi-host testing): ``jax.distributed.initialize`` + cross-process XLA
collectives actually run, on a 2-process × 2-virtual-CPU-device localhost
cluster — the DCN codepath the single-process 8-device tests never touch.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(os.environ.get("CRT_TEST_TPU"),
                    reason="multi-process CPU cluster test; skip on the "
                    "single real TPU")
def test_two_process_render_and_train():
    port = _free_port()
    worker = os.path.join(REPO, "tools", "multiprocess_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert [o["process_count"] for o in outs] == [2, 2]
    assert [o["global_devices"] for o in outs] == [4, 4]
    for o in outs:
        assert o["ok"]
    # both processes computed the SAME replicated frame and psum'd loss —
    # the collectives really ran across process boundaries
    assert outs[0]["render_checksum"] == outs[1]["render_checksum"]
    assert outs[0]["loss"] == outs[1]["loss"]
