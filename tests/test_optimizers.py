"""Dense optimizer parity vs torch.optim (the reference's hand-written
optimizers reproduce torch semantics — optim.cpp:50,85,149; defaults in
datatypes.py:43-79). Multi-step trajectories must match to float tolerance."""

import numpy as np
import pytest
import torch

from marius_tpu.nn.optimizers import (
    OptimizerConfig,
    apply_optimizer,
    init_optimizer,
)

STEPS = 5


def _run_ours(config, params0, grads_per_step):
    params = {"w": np.array(params0, np.float32)}
    state = init_optimizer(config, params)
    for g in grads_per_step:
        params, state = apply_optimizer(config, params, state,
                                        {"w": np.array(g, np.float32)})
    return np.asarray(params["w"])


def _run_torch(make_opt, params0, grads_per_step):
    p = torch.nn.Parameter(torch.tensor(params0, dtype=torch.float32))
    opt = make_opt([p])
    for g in grads_per_step:
        opt.zero_grad()
        p.grad = torch.tensor(g, dtype=torch.float32)
        opt.step()
    return p.detach().numpy()


@pytest.fixture
def traj():
    rng = np.random.default_rng(0)
    params0 = rng.standard_normal((4, 6)).astype(np.float32)
    grads = [rng.standard_normal((4, 6)).astype(np.float32)
             for _ in range(STEPS)]
    return params0, grads


def test_sgd_matches_torch(traj):
    params0, grads = traj
    ours = _run_ours(OptimizerConfig("SGD", learning_rate=0.1), params0, grads)
    ref = _run_torch(lambda ps: torch.optim.SGD(ps, lr=0.1), params0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_sgd_momentum_weight_decay_matches_torch(traj):
    params0, grads = traj
    cfg = OptimizerConfig("SGD", learning_rate=0.05, momentum=0.9,
                          weight_decay=0.01)
    ours = _run_ours(cfg, params0, grads)
    ref = _run_torch(lambda ps: torch.optim.SGD(
        ps, lr=0.05, momentum=0.9, weight_decay=0.01), params0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_adagrad_matches_torch(traj):
    params0, grads = traj
    cfg = OptimizerConfig("ADAGRAD", learning_rate=0.1, eps=1e-10,
                          init_value=0.0, lr_decay=0.0)
    ours = _run_ours(cfg, params0, grads)
    ref = _run_torch(lambda ps: torch.optim.Adagrad(
        ps, lr=0.1, eps=1e-10), params0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_adagrad_lr_decay_and_init_value_matches_torch(traj):
    params0, grads = traj
    cfg = OptimizerConfig("ADAGRAD", learning_rate=0.1, eps=1e-10,
                          init_value=0.5, lr_decay=0.1)
    ours = _run_ours(cfg, params0, grads)
    ref = _run_torch(lambda ps: torch.optim.Adagrad(
        ps, lr=0.1, eps=1e-10, lr_decay=0.1,
        initial_accumulator_value=0.5), params0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_adam_matches_torch(traj):
    params0, grads = traj
    cfg = OptimizerConfig("ADAM", learning_rate=0.01, beta_1=0.9,
                          beta_2=0.999, adam_eps=1e-8)
    ours = _run_ours(cfg, params0, grads)
    ref = _run_torch(lambda ps: torch.optim.Adam(
        ps, lr=0.01, betas=(0.9, 0.999), eps=1e-8), params0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_adam_amsgrad_matches_torch(traj):
    params0, grads = traj
    cfg = OptimizerConfig("ADAM", learning_rate=0.01, amsgrad=True)
    ours = _run_ours(cfg, params0, grads)
    ref = _run_torch(lambda ps: torch.optim.Adam(
        ps, lr=0.01, amsgrad=True), params0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_adam_weight_decay_matches_torch(traj):
    params0, grads = traj
    cfg = OptimizerConfig("ADAM", learning_rate=0.01, weight_decay=0.02)
    ours = _run_ours(cfg, params0, grads)
    ref = _run_torch(lambda ps: torch.optim.Adam(
        ps, lr=0.01, weight_decay=0.02), params0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)
