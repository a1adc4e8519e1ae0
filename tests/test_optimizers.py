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


# ---------------------------------------------------------------------------
# Per-layer optimizers (GroupedOptimizerConfig; setup_optimizers,
# nn/model.cpp:161-218)
# ---------------------------------------------------------------------------

def _nested_params():
    rng = np.random.default_rng(0)
    return {
        "encoder": [
            [{"w": rng.standard_normal((3, 4)).astype(np.float32)}],
            [{"w": rng.standard_normal((4, 2)).astype(np.float32),
              "bias": rng.standard_normal((2,)).astype(np.float32)}],
        ],
        "decoder": {"relations": rng.standard_normal((2, 4)).astype(np.float32)},
    }


def _grads_like(params, scale=1.0):
    import jax
    rng = np.random.default_rng(1)
    return jax.tree_util.tree_map(
        lambda p: (scale * rng.standard_normal(p.shape)).astype(np.float32),
        params)


def test_grouped_uniform_matches_plain():
    """Overrides identical to the default reproduce the plain optimizer's
    trajectory exactly."""
    import jax
    from marius_tpu.nn.optimizers import GroupedOptimizerConfig

    base = OptimizerConfig("ADAGRAD", learning_rate=0.05, lr_decay=0.01)
    grouped = GroupedOptimizerConfig(
        default=base, overrides=((("encoder", 1, 0), base),))

    p_plain, p_grp = _nested_params(), _nested_params()
    s_plain = init_optimizer(base, p_plain)
    s_grp = init_optimizer(grouped, p_grp)
    for step in range(4):
        g = _grads_like(p_plain, scale=0.1 * (step + 1))
        p_plain, s_plain = apply_optimizer(base, p_plain, s_plain, g)
        p_grp, s_grp = apply_optimizer(grouped, p_grp, s_grp, g)
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_grp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_grouped_override_applies_per_group():
    """A layer under an override steps with ITS optimizer; everything else
    steps with the default — each verified against a standalone run."""
    import jax
    from marius_tpu.nn.optimizers import GroupedOptimizerConfig

    default = OptimizerConfig("ADAM", learning_rate=0.01)
    slow_sgd = OptimizerConfig("SGD", learning_rate=0.5, momentum=0.9)
    grouped = GroupedOptimizerConfig(
        default=default,
        overrides=((("encoder", 0, 0), slow_sgd), (("decoder",), slow_sgd)))

    params = _nested_params()
    grads = [_grads_like(params, scale=0.1 * (i + 1)) for i in range(3)]

    p, s = params, init_optimizer(grouped, params)
    for g in grads:
        p, s = apply_optimizer(grouped, p, s, g)

    # standalone trajectories of each subtree under its own optimizer
    def run(cfg, sub, sub_grads):
        st = init_optimizer(cfg, sub)
        for g in sub_grads:
            sub, st = apply_optimizer(cfg, sub, st, g)
        return sub

    ref_l00 = run(slow_sgd, params["encoder"][0][0],
                  [g["encoder"][0][0] for g in grads])
    ref_dec = run(slow_sgd, params["decoder"], [g["decoder"] for g in grads])
    ref_l10 = run(default, params["encoder"][1][0],
                  [g["encoder"][1][0] for g in grads])

    for got, want in [(p["encoder"][0][0], ref_l00), (p["decoder"], ref_dec),
                      (p["encoder"][1][0], ref_l10)]:
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
    # and the override really did something different from the default
    p_all_default = _nested_params()
    sd = init_optimizer(default, p_all_default)
    for g in grads:
        p_all_default, sd = apply_optimizer(default, p_all_default, sd, g)
    assert not np.allclose(np.asarray(p["encoder"][0][0]["w"]),
                           np.asarray(p_all_default["encoder"][0][0]["w"]))


@pytest.mark.slow
def test_grouped_from_config_trains_distinct_trajectory(tmp_path):
    """A layer-level `optimizer:` block in the YAML changes that layer's
    trained params (and only shows up when configured): the config path from
    schema.py through the trainer honors per-layer optimizers end to end."""
    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import marius_train
    from marius_tpu.nn.optimizers import GroupedOptimizerConfig
    from marius_tpu.tools.preprocess import generate_random_dataset_nc

    ds_dir = str(tmp_path / "ds_plo")
    generate_random_dataset_nc(ds_dir, num_nodes=60, num_edges=600,
                               num_classes=4, feature_dim=8)

    def raw(layer_opt):
        gnn = {"type": "GNN", "input_dim": 8, "output_dim": 4,
               "options": {"type": "GRAPH_SAGE", "aggregator": "MEAN"}}
        if layer_opt:
            gnn = dict(gnn, optimizer={
                "type": "SGD", "options": {"learning_rate": 1e-4}})
        return {
            "model": {
                "learning_task": "NODE_CLASSIFICATION",
                "encoder": {
                    "layers": [[{"type": "FEATURE", "output_dim": 8}], [gnn]],
                    "train_neighbor_sampling": [
                        {"type": "UNIFORM", "options": {"max_neighbors": 4}}],
                },
                "loss": {"type": "CROSS_ENTROPY"},
                "dense_optimizer": {"type": "ADAM",
                                    "options": {"learning_rate": 0.01}},
            },
            "storage": {"dataset": {"dataset_dir": ds_dir},
                        "save_model": False},
            "training": {"batch_size": 30, "num_epochs": 1},
            "evaluation": {"batch_size": 30},
        }

    cfg = load_config(raw(True))
    assert isinstance(cfg.model.dense_optimizer, GroupedOptimizerConfig)
    assert cfg.model.dense_optimizer.overrides[0][0] == ("encoder", 1, 0)
    r_grouped = marius_train(cfg)
    r_plain = marius_train(load_config(raw(False)))
    # both train; the near-zero-lr SGD layer must yield a different epoch loss
    assert r_grouped["epochs"][0]["loss"] != r_plain["epochs"][0]["loss"]
