"""Multi-process jax.distributed validation (VERDICT r1 item 3).

The reference validates its NCCL bring-up with a manual smoke script
(rendering/src/megapose/scripts/test_distributed.py:37-54); here the
equivalent is automated: two REAL processes, an explicit coordinator,
broadcast + barrier + one sharded train step with cross-process replica
consistency, all on CPU.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class TestInitializeAPI:
    def test_single_process_noop(self):
        """Zero-arg initialize in a single-process env must not raise."""
        from picopose_tpu.parallel import distributed as dist

        dist.initialize()  # may or may not connect; must not raise

    def test_explicit_kwargs_reach_jax(self, monkeypatch):
        """Explicit coordinator kwargs must be passed through to
        jax.distributed.initialize, not swallowed (the round-1 bug)."""
        import picopose_tpu.parallel.distributed as dist

        seen = {}

        def fake_init(**kwargs):
            seen.update(kwargs)

        monkeypatch.setattr(dist.jax.distributed, "initialize", fake_init)
        monkeypatch.setattr(dist, "is_initialized", lambda: False)
        dist.initialize(
            coordinator_address="host:1", num_processes=2, process_id=1
        )
        assert seen == {
            "coordinator_address": "host:1",
            "num_processes": 2,
            "process_id": 1,
        }


@pytest.mark.slow
class TestTwoProcess:
    def test_broadcast_barrier_and_sharded_step(self):
        port = _free_port()
        worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        }
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env,
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            # generous: two concurrent JAX processes each compile a ViT-S
            # train step; on a 1-core CI host with a parallel suite running
            # this has been observed to exceed 15 min from contention alone
            out, err = p.communicate(timeout=2700)
            outs.append((p.returncode, out, err))
        for rc, out, err in outs:
            assert rc == 0, f"worker failed:\n{err[-3000:]}"
            assert "DIST_OK" in out, out
