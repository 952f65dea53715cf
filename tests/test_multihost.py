"""Multi-host bring-up test: 2 local jax.distributed processes over loopback
(SURVEY.md §4 'Multi-host paths tested by spawning N local jax.distributed
processes'). Each process runs a psum across hosts and checks per-host data
sharding assignment."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    addr, n, i = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(addr, num_processes=n, process_id=i,
                               local_device_ids=[0])
    assert jax.process_count() == n, jax.process_count()
    from pytorch_end2end_speech_recognition_tpu.parallel.mesh import (
        host_shard_info,
    )
    shard, total = host_shard_info()
    assert (shard, total) == (i, n), (shard, total)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    got = multihost_utils.process_allgather(jnp.asarray([i + 1]))
    assert got.reshape(-1).tolist() == [1, 2], got
    print(f"proc {i} OK")
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(120)
def test_two_process_distributed_loopback(tmp_path):
    addr = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # one device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=100)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed loopback rendezvous timed out here")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
