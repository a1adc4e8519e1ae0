"""Custom layer/decoder/loss registry (parity: the reference's Python
trampoline extensibility, layer_wrap.cpp:10-22 — users plug components in
without editing the package; here they register (init, forward) pairs)."""

import copy

import numpy as np
import pytest

from marius_tpu.config.schema import load_config
from marius_tpu.config.validate import ConfigError
from marius_tpu.manager import marius_train
from marius_tpu.nn import registry
from marius_tpu.tools.preprocess import generate_random_dataset_lp


@pytest.fixture(autouse=True)
def _register():
    import jax.numpy as jnp
    from marius_tpu.nn.initialization import initialize_tensor
    from marius_tpu.ops.segment import masked_mean

    def init(key, cfg, dtype):
        return {"w": initialize_tensor(key, cfg.init,
                                       (cfg.input_dim, cfg.output_dim), dtype)}

    def fwd(cfg, params, x, adj, **ctx):
        nbr = masked_mean(x[adj.in_nbr_idx], adj.in_mask)
        return (x[adj.self_idx] + nbr) @ params["w"]

    registry.register_gnn_layer("T_MEAN_RESIDUAL", init, fwd)

    def loss(pos, neg, *, reduction="MEAN", mask=None, neg_mask=None):
        from marius_tpu.nn.losses import softmax_ce
        return 2.0 * softmax_ce(pos, neg, reduction=reduction, mask=mask,
                                neg_mask=neg_mask)

    registry.register_loss("T_DOUBLE_CE", loss)
    registry.register_relation_op("T_SCALED_HADAMARD",
                                  lambda e, r: e * r * 0.5 if r is not None else e)
    registry.register_edge_decoder("T_SCALED_DISTMULT", "DOT",
                                   "T_SCALED_HADAMARD", relation_init="ones")

    def dense_init(key, cfg, dtype):
        return {"w": initialize_tensor(key, cfg.init,
                                       (cfg.input_dim, cfg.output_dim), dtype)}

    registry.register_stage_layer("T_DENSE", dense_init,
                                  lambda cfg, p, cur, emb, feat: cur @ p["w"])
    yield


def _config(tmp_path, name):
    cfg = {
        "model": {
            "learning_task": "LINK_PREDICTION",
            "encoder": {
                "layers": [
                    [{"type": "EMBEDDING", "output_dim": 16}],
                    [{"type": "GNN", "input_dim": 16, "output_dim": 16,
                      "options": {"type": "T_MEAN_RESIDUAL"}}],
                ],
                "train_neighbor_sampling": [
                    {"type": "UNIFORM", "options": {"max_neighbors": 4}}],
            },
            "decoder": {"type": "T_SCALED_DISTMULT",
                        "options": {"input_dim": 16}},
            "loss": {"type": "T_DOUBLE_CE", "options": {"reduction": "SUM"}},
            "dense_optimizer": {"type": "ADAM",
                                "options": {"learning_rate": 0.1}},
            "sparse_optimizer": {"type": "ADAGRAD",
                                 "options": {"learning_rate": 0.1}},
        },
        "storage": {"dataset": {"dataset_dir": ""}, "save_model": False},
        "training": {
            "batch_size": 100,
            "negative_sampling": {"num_chunks": 4,
                                  "negatives_per_positive": 16},
            "num_epochs": 2,
        },
        "evaluation": {"batch_size": 100,
                       "negative_sampling": {"filtered": True}},
    }
    ds = str(tmp_path / f"ds_{name}")
    generate_random_dataset_lp(ds, num_nodes=60, num_edges=600,
                               num_relations=4)
    cfg["storage"]["dataset"]["dataset_dir"] = ds
    return cfg


def test_custom_components_train_via_config(tmp_path):
    """A registered GNN layer + decoder + loss train end-to-end through the
    YAML config path with no package edits."""
    result = marius_train(load_config(_config(tmp_path, "e2e")))
    assert len(result["epochs"]) == 2
    assert np.isfinite(result["epochs"][-1]["loss"])
    assert 0.0 < result["test"]["mrr"] <= 1.0


def test_validation_accepts_registered_rejects_unknown(tmp_path):
    raw = _config(tmp_path, "val")
    load_config(copy.deepcopy(raw))  # registered names validate cleanly
    bad = copy.deepcopy(raw)
    bad["model"]["encoder"]["layers"][1][0]["options"]["type"] = "NOPE_LAYER"
    with pytest.raises(ConfigError, match="NOPE_LAYER"):
        load_config(bad)


def test_custom_loss_scales_builtin():
    import jax.numpy as jnp
    from marius_tpu.nn.losses import get_loss_function
    pos = jnp.asarray([1.0, 2.0])
    neg = jnp.asarray([[0.5, 0.1], [0.2, 0.3]])
    base = get_loss_function("SOFTMAX_CE", reduction="SUM")(pos, neg)
    doubled = get_loss_function("T_DOUBLE_CE", reduction="SUM")(pos, neg)
    assert float(doubled) == pytest.approx(2 * float(base), rel=1e-6)


def test_custom_stage_layer_forward():
    import jax
    import jax.numpy as jnp
    from marius_tpu.nn.encoder import EncoderConfig, encoder_forward, init_encoder_params
    from marius_tpu.nn.layers import LayerConfig
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=8),),
        (LayerConfig(layer_type="T_DENSE", input_dim=8, output_dim=4),),
    ))
    params = init_encoder_params(jax.random.key(0), enc)
    x = jnp.ones((5, 8))
    out = encoder_forward(enc, params, x, None)
    assert out.shape == (5, 4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x @ params[1][0]["w"]), rtol=1e-6)


def test_example_script_registers():
    import importlib.util
    import pathlib
    path = pathlib.Path(__file__).resolve().parents[1] / "examples" / \
        "python" / "custom_layer.py"
    spec = importlib.util.spec_from_file_location("custom_layer_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # registers on import
    assert registry.gnn_layer("MEAN_RESIDUAL") is not None
    assert registry.loss("SQUARED_SOFTMAX_CE") is not None
    assert registry.edge_decoder("SCALED_DISTMULT") is not None
