"""Multi-host (multi-controller) training: two coordinated processes, each
owning 4 of the 8 virtual CPU devices, run the SAME GSPMD LP training program
over one global (data x node) mesh — the JAX multi-controller model SURVEY
§2.3 names for the cross-host DCN tier (the reference has no multi-node path
at all; its ceiling is single-process NCCL, model.cpp:136-159)."""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # see pyproject [tool.pytest.ini_options]

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@needs8
def test_cli_env_multihost(tmp_path):
    """MARIUS_COORDINATOR env vars make the stock `marius_train` CLI run
    multi-controller: two processes train the same YAML over a global mesh
    and report identical test metrics."""
    from marius_tpu.tools.preprocess.generate import generate_random_dataset_lp

    ds = tmp_path / "ds_cli_mh"
    generate_random_dataset_lp(str(ds), num_nodes=60, num_edges=600,
                               num_relations=4)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
model:
  learning_task: LINK_PREDICTION
  encoder:
    layers: [[{{type: EMBEDDING, output_dim: 16}}]]
  decoder: {{type: DISTMULT}}
  loss: {{type: SOFTMAX_CE, options: {{reduction: SUM}}}}
storage:
  dataset: {{dataset_dir: {ds}/}}
  save_model: false
training:
  batch_size: 40
  num_epochs: 2
  negative_sampling: {{num_chunks: 4, negatives_per_positive: 8}}
  mesh: {{data: 4, node: 2}}
evaluation:
  batch_size: 40
  negative_sampling: {{filtered: true}}
""")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["MARIUS_COORDINATOR"] = f"localhost:{port}"
    env["MARIUS_NUM_PROCESSES"] = "2"
    env.pop("PYTEST_CURRENT_TEST", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))

    procs = []
    for i in range(2):
        e = dict(env)
        e["MARIUS_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "from marius_tpu.tools.cli import marius_train;"
             f"marius_train([{str(str(cfg))!r}])"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=e,
            cwd=str(tmp_path)))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"cli worker {i} failed:\n{out[-4000:]}"
    metrics = [json.loads([l for l in out.splitlines()
                           if l.startswith("{")][-1]) for out in outs]
    for m in metrics:
        m.pop("eval_time_s", None)   # wall-clock differs per process
    assert metrics[0] == metrics[1]
    assert 0.0 < metrics[0]["mrr"] <= 1.0


@needs8
def test_two_process_training_matches_single_process(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTEST_CURRENT_TEST", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    port = _free_port()

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=str(tmp_path)) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode())
    finally:
        # one worker dying leaves its peer blocked in a collective — never
        # leak the pair past the test
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    def parse(tag):
        res = []
        for out in outs:
            line = [l for l in out.splitlines() if l.startswith(tag + " ")][-1]
            res.append(json.loads(line[len(tag) + 1:]))
        return res

    losses = parse("LOSSES")
    losses_x = parse("LOSSES_X")
    # both controllers compute the same global program
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(losses_x[0], losses_x[1], rtol=1e-6)

    # and the 2-process run reproduces the single-process 8-device
    # trajectory (same seed, same global mesh shape) in BOTH modes
    from marius_tpu.parallel.mesh import make_mesh
    from tests.multihost_worker import build_trainer

    mesh = make_mesh(num_data=4, num_node=2, devices=jax.devices()[:8])
    trainer = build_trainer(mesh)
    ref = [trainer.train_epoch()["loss"] for _ in range(3)]
    np.testing.assert_allclose(losses[0], ref, rtol=1e-5)
    assert ref[-1] < ref[0]

    # filtered evaluation ran multi-controller and matches in-process
    from tests.multihost_worker import evaluate_lp
    mrr = parse("MRR")
    np.testing.assert_allclose(mrr[0], mrr[1], rtol=1e-6)
    np.testing.assert_allclose(mrr[0], evaluate_lp(trainer), rtol=1e-5)

    # host-streamed edge tier under the multi-process mesh
    losses_h = parse("LOSSES_HOST")
    np.testing.assert_allclose(losses_h[0], losses_h[1], rtol=1e-6)
    assert all(np.isfinite(losses_h[0]))
    trainer_x = build_trainer(mesh, sharding_mode="explicit")
    ref_x = [trainer_x.train_epoch()["loss"] for _ in range(3)]
    np.testing.assert_allclose(losses_x[0], ref_x, rtol=1e-5)

    # GNN LP through the explicit shard_map step (ALL sampling =>
    # deterministic; 2-process must reproduce the single-process run)
    from tests.multihost_worker import build_gnn_lp_trainer
    losses_xg = parse("LOSSES_XG")
    np.testing.assert_allclose(losses_xg[0], losses_xg[1], rtol=1e-6)
    trainer_xg = build_gnn_lp_trainer(mesh)
    ref_xg = [trainer_xg.train_epoch()["loss"] for _ in range(3)]
    np.testing.assert_allclose(losses_xg[0], ref_xg, rtol=1e-5)
    assert ref_xg[-1] < ref_xg[0]

    # data-parallel NC over the same 2-process mesh
    from tests.multihost_worker import build_nc_trainer
    losses_nc = parse("LOSSES_NC")
    np.testing.assert_allclose(losses_nc[0], losses_nc[1], rtol=1e-6)
    trainer_nc = build_nc_trainer(mesh)
    ref_nc = [trainer_nc.train_epoch()["loss"] for _ in range(3)]
    np.testing.assert_allclose(losses_nc[0], ref_nc, rtol=1e-5)
    from tests.multihost_worker import evaluate_nc
    acc = parse("NC_ACC")
    np.testing.assert_allclose(acc[0], acc[1], rtol=1e-6)
    np.testing.assert_allclose(acc[0], evaluate_nc(trainer_nc), atol=1e-6)

    # out-of-core buffer training over the same 2-process mesh (replicated
    # working set, data-sharded batches, host-RAM table + swaps)
    from tests.multihost_worker import build_buffer_trainer
    losses_buf = parse("LOSSES_BUF")
    np.testing.assert_allclose(losses_buf[0], losses_buf[1], rtol=1e-6)
    trainer_buf = build_buffer_trainer(mesh)
    ref_buf = [trainer_buf.train_epoch()["loss"] for _ in range(3)]
    np.testing.assert_allclose(losses_buf[0], ref_buf, rtol=1e-5)
    resume = parse("BUF_RESUME")
    np.testing.assert_allclose(resume[0], resume[1], rtol=1e-6)
    assert np.isfinite(resume[0])

    # out-of-core NC (partition feature cache) — all four trainers covered
    from tests.multihost_worker import build_nc_buffer_trainer
    losses_ncb = parse("LOSSES_NCB")
    np.testing.assert_allclose(losses_ncb[0], losses_ncb[1], rtol=1e-6)
    trainer_ncb = build_nc_buffer_trainer(mesh)
    ref_ncb = [trainer_ncb.train_epoch()["loss"] for _ in range(3)]
    np.testing.assert_allclose(losses_ncb[0], ref_ncb, rtol=1e-5)

    # ring-sharded exact-ALL full-graph NC across processes
    from tests.multihost_worker import build_ring_trainer
    losses_ring = parse("LOSSES_RING")
    np.testing.assert_allclose(losses_ring[0], losses_ring[1], rtol=1e-6)
    ring_mesh = make_mesh(num_data=1, num_node=8, devices=jax.devices()[:8])
    trainer_ring = build_ring_trainer(ring_mesh)
    ref_ring = [trainer_ring.train_epoch()["loss"] for _ in range(3)]
    np.testing.assert_allclose(losses_ring[0], ref_ring, rtol=1e-4)
    acc_ring = parse("RING_ACC")
    np.testing.assert_allclose(acc_ring[0], acc_ring[1], rtol=1e-6)
    np.testing.assert_allclose(acc_ring[0], evaluate_nc(trainer_ring),
                               atol=1e-6)

