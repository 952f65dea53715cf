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


def _run_workers(script_path, argv, n=2, timeout_s=240):
    """Spawn n loopback jax.distributed worker processes; returns outputs."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(script_path), *argv, str(n), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(n)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout_s)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed loopback rendezvous timed out here")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    return outs


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


# --------------------------------------------------------------------------
# VERDICT r1 item 1: 2-process Solver.fit must equal a single-process run on
# the same global batches (multi-host DP end-to-end, BASELINE.json:5,11).
# --------------------------------------------------------------------------

FIT_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    corpus_dir, out_path, addr, n, i = sys.argv[1:6]
    n, i = int(n), int(i)
    jax.distributed.initialize(addr, num_processes=n, process_id=i,
                               local_device_ids=[0])
    import numpy as np
    from pytorch_end2end_speech_recognition_tpu.data.dataset import (
        BucketedLoader,
    )
    from pytorch_end2end_speech_recognition_tpu.data.manifest import (
        read_manifest,
    )
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        CharTokenizer,
    )
    from pytorch_end2end_speech_recognition_tpu.parallel.mesh import make_mesh
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
    from tests.multihost_cfg import tiny_fit_cfg

    cfg = tiny_fit_cfg(corpus_dir)
    utts = read_manifest(cfg.data.train_manifest)
    tok = CharTokenizer([u.text for u in utts])
    loader = BucketedLoader(utts, tok, cfg.data, shard_index=i, num_shards=n)
    dev = BucketedLoader(read_manifest(cfg.data.dev_manifest), tok, cfg.data,
                         train=False, shard_index=i, num_shards=n)
    mesh = make_mesh(dp=n, tp=1)
    solver = Solver(cfg, tok, mesh=mesh)
    hist = solver.fit(loader, steps=6)
    wer = solver.evaluate(dev)
    # every host must see the same aggregated WER
    from jax.experimental import multihost_utils
    wers = np.asarray(multihost_utils.process_allgather(
        np.asarray([wer]))).reshape(-1)
    assert np.all(wers == wers[0]), wers
    if i == 0:
        import jax.tree_util as jtu
        leaves = [np.asarray(v[...])
                  for v in jtu.tree_leaves(solver.params)]
        np.savez(out_path + ".npz", *leaves)
        json.dump({"losses": hist["loss"], "wer": float(wer)},
                  open(out_path, "w"))
    print(f"proc {i} OK")
    """
)


@pytest.mark.timeout(300)
@pytest.mark.slow
def test_two_process_solver_fit_matches_single(tmp_path, digits_corpus):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_end2end_speech_recognition_tpu.data.dataset import (
        BucketedLoader,
    )
    from pytorch_end2end_speech_recognition_tpu.data.manifest import (
        read_manifest,
    )
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        CharTokenizer,
    )
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
    from tests.multihost_cfg import tiny_fit_cfg

    corpus_dir = str(digits_corpus["train"]).rsplit("/", 1)[0]
    script = tmp_path / "fit_worker.py"
    script.write_text(FIT_WORKER)
    out = tmp_path / "result.json"
    addr = f"127.0.0.1:{_free_port()}"
    _run_workers(script, [corpus_dir, str(out), addr], n=2)
    got = __import__("json").load(open(out))

    # single-process reference over the SAME global batch stream: concat the
    # two loader shards in data-axis order and replicate the fit() rng walk
    cfg = tiny_fit_cfg(corpus_dir)
    utts = read_manifest(cfg.data.train_manifest)
    tok = CharTokenizer([u.text for u in utts])
    shards = [
        BucketedLoader(utts, tok, cfg.data, shard_index=s, num_shards=2)
        for s in range(2)
    ]
    solver = Solver(cfg, tok)
    key = jax.random.PRNGKey(cfg.train.seed)
    ref_losses = []
    step = 0
    ep = 0
    while step < 6:
        for b0, b1 in zip(shards[0].epoch(ep), shards[1].epoch(ep)):
            if step >= 6:
                break
            key, sub = jax.random.split(key)
            args = tuple(
                jnp.asarray(np.concatenate([a, b], axis=0))
                for a, b in [(b0.audio, b1.audio),
                             (b0.audio_lens, b1.audio_lens),
                             (b0.tokens, b1.tokens),
                             (b0.token_lens, b1.token_lens)]
            )
            out5 = solver._train_step(
                solver.params, solver.opt_state, solver.rest, *args, sub,
                jnp.asarray(1.0, jnp.float32),
            )
            solver.params, solver.opt_state, solver.rest, metrics = out5
            ref_losses.append(float(metrics["loss"]))
            step += 1
        ep += 1

    np.testing.assert_allclose(got["losses"], ref_losses, rtol=2e-4)
    ref_leaves = [np.asarray(v[...])
                  for v in jax.tree_util.tree_leaves(solver.params)]
    dist = np.load(str(out) + ".npz")
    assert len(dist.files) == len(ref_leaves)
    for name, ref in zip(dist.files, ref_leaves):
        np.testing.assert_allclose(dist[name], ref, rtol=5e-4, atol=5e-5)


CLI_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    cfg_path, addr, n, i = sys.argv[1:5]
    os.environ["ASR_COORDINATOR_ADDRESS"] = addr
    os.environ["ASR_NUM_PROCESSES"] = n
    os.environ["ASR_PROCESS_ID"] = i
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pytorch_end2end_speech_recognition_tpu.cli import train
    train.main(["--config", cfg_path, "--steps", "4"])
    print(f"proc {i} OK")
    """
)


@pytest.mark.timeout(300)
def test_two_process_train_cli(tmp_path, digits_corpus):
    """The real train CLI launches multi-host from env vars alone: rendezvous,
    per-host loader shards, mesh over global devices, proc-0 metrics."""
    import json

    from tests.multihost_cfg import tiny_fit_cfg

    corpus_dir = str(digits_corpus["train"]).rsplit("/", 1)[0]
    cfg = tiny_fit_cfg(corpus_dir)
    cfg.train.metrics_path = str(tmp_path / "metrics.jsonl")
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_every = 1
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    script = tmp_path / "cli_worker.py"
    script.write_text(CLI_WORKER)
    addr = f"127.0.0.1:{_free_port()}"
    outs = _run_workers(script, [str(cfg_path), addr], n=2)
    for i, out in enumerate(outs):
        assert f"proc {i} OK" in out, out
    rows = [json.loads(l) for l in
            open(tmp_path / "metrics.jsonl").read().splitlines()]
    train_rows = [r for r in rows if r["tag"] == "train"]
    assert train_rows and train_rows[-1]["step"] == 4
    import math
    assert all(math.isfinite(r["loss"]) for r in train_rows)
