"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest.py): the same path __graft_entry__.dryrun_multichip validates."""

import jax
import numpy as np
import pytest

from marius_tpu.parallel.mesh import DATA_AXIS, NODE_AXIS, make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lp_training_matches_single_device_loss_trend():
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.trainer import LinkPredictionTrainer

    rng = np.random.default_rng(0)
    n, r, e = 128, 4, 800
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], 1).astype(np.int32)
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=16),),))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, 16))

    mesh = make_mesh(num_data=4, num_node=2)
    tr = LinkPredictionTrainer(
        model, n, r, edges, NegativeSamplingConfig(2, 8),
        batch_size=80, mesh=mesh)

    # table rows are actually sharded over the node axis
    spec = tr.state.table.values.sharding.spec
    assert NODE_AXIS in str(spec)

    stats = tr.train(3)
    assert stats[-1]["loss"] < stats[0]["loss"]

    # sharded training must track the single-device run closely
    tr1 = LinkPredictionTrainer(
        model, n, r, edges, NegativeSamplingConfig(2, 8), batch_size=80)
    stats1 = tr1.train(3)
    assert abs(stats[-1]["loss"] - stats1[-1]["loss"]) / stats1[-1]["loss"] < 0.05


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_shapes():
    mesh = make_mesh(num_data=8, num_node=1)
    assert mesh.shape == {DATA_AXIS: 8, NODE_AXIS: 1}
    mesh = make_mesh(num_data=2, num_node=4)
    assert mesh.shape == {DATA_AXIS: 2, NODE_AXIS: 4}
