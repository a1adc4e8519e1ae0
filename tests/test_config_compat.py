"""Reference-config compatibility: the reference's shipped example YAMLs
(/root/reference/examples/configuration/*.yaml) and its e2e fragment matrix
(/root/reference/test/test_configs/{lp,nc}/) must load through our loader —
same spellings, inert knobs warned not rejected (marius_config.py parity)."""

import copy
import itertools
import os
import warnings
from pathlib import Path

import pytest
import yaml

from marius_tpu.config.schema import load_config
from marius_tpu.config.validate import ConfigError, check_compat_keys
from tests.test_manager import LP_BASE

REF = Path("/root/reference")
EXAMPLES = REF / "examples" / "configuration"
FRAGMENTS = REF / "test" / "test_configs"

needs_reference = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not present")

# stand-in for the fragments' `dataset: ???` OmegaConf placeholder
DATASET_STUB = {"dataset_dir": "", "num_edges": 1000, "num_nodes": 100,
                "num_relations": 10, "num_train": 1000, "num_valid": 100,
                "num_test": 100, "num_classes": 10, "feature_dim": 10}


def _base():
    d = copy.deepcopy(LP_BASE)
    d["storage"]["dataset"]["dataset_dir"] = ""
    return d


@needs_reference
@pytest.mark.parametrize("name", ["fb15k_237", "ogbn_arxiv", "custom_lp",
                                  "custom_nc", "sakila"])
def test_reference_example_config_loads(name):
    raw = yaml.safe_load(open(EXAMPLES / f"{name}.yaml"))
    cfg = load_config(raw)
    assert cfg.model.learning_task in ("LINK_PREDICTION", "NODE_CLASSIFICATION")


@needs_reference
@pytest.mark.slow
def test_reference_fragment_cartesian_loads():
    """Every model x storage x training x evaluation fragment combination from
    the reference's own e2e matrix (generate_test_configs.py) must load. The
    three fragments carrying the reference's `ouptut_dim` typo must fail with
    an actionable did-you-mean instead of loading silently."""
    n_ok = n_typo = 0
    for task in ("lp", "nc"):
        d = FRAGMENTS / task
        parts = [sorted((d / x).glob("*.yaml"))
                 for x in ("model", "storage", "training", "evaluation")]
        for m, s, t, e in itertools.product(*parts):
            raw = {"model": yaml.safe_load(open(m)),
                   "storage": yaml.safe_load(open(s)),
                   "training": yaml.safe_load(open(t)),
                   "evaluation": yaml.safe_load(open(e))}
            raw["storage"]["dataset"] = dict(DATASET_STUB)
            if "ouptut_dim" in open(m).read():
                with pytest.raises(ConfigError, match="output_dim"):
                    load_config(raw)
                n_typo += 1
            else:
                load_config(raw)
                n_ok += 1
    assert n_ok >= 800
    assert n_typo > 0


def test_sampler_direction_reference_spelling():
    # per-sampler use_incoming_nbrs/use_outgoing_nbrs (marius_config.py:272-276)
    d = _base()
    d["model"]["encoder"] = {
        "layers": [
            [{"type": "EMBEDDING", "output_dim": 16}],
            [{"type": "GNN", "input_dim": 16, "output_dim": 16,
              "options": {"type": "GRAPH_SAGE", "aggregator": "MEAN"}}],
        ],
        "train_neighbor_sampling": [
            {"type": "UNIFORM", "use_incoming_nbrs": True,
             "use_outgoing_nbrs": False, "options": {"max_neighbors": 4}}],
    }
    cfg = load_config(d)
    ns = cfg.train_neighbor_sampling[0]
    assert ns.use_incoming and not ns.use_outgoing


def test_encoder_level_direction_defaults():
    # EncoderConfig.use_incoming_nbrs/use_outgoing_nbrs set per-sampler
    # defaults (marius_config.py:259-260); per-sampler keys override
    d = _base()
    d["model"]["encoder"] = {
        "use_incoming_nbrs": False,
        "use_outgoing_nbrs": True,
        "layers": [
            [{"type": "EMBEDDING", "output_dim": 16}],
            [{"type": "GNN", "input_dim": 16, "output_dim": 16,
              "options": {"type": "GRAPH_SAGE", "aggregator": "MEAN"}}],
        ],
        "train_neighbor_sampling": [{"type": "UNIFORM",
                                     "options": {"max_neighbors": 4}}],
    }
    cfg = load_config(d)
    ns = cfg.train_neighbor_sampling[0]
    assert not ns.use_incoming and ns.use_outgoing


def test_alternate_spellings_honored():
    d = _base()
    d["model"]["random_seed"] = 99            # -> training.seed
    d["training"]["save_model"] = False       # -> storage.save_model
    d["storage"]["prefetch"] = False          # -> storage.prefetching
    d["storage"]["dataset"]["node_feature_dim"] = 12  # -> feature_dim
    cfg = load_config(d)
    assert cfg.training.seed == 99
    assert cfg.storage.save_model is False
    assert cfg.storage.prefetching is False
    assert cfg.storage.dataset.feature_dim == 12


def test_compat_keys_warn_not_reject():
    d = _base()
    d["training"]["pipeline"] = {"sync": False, "staleness_bound": 4,
                                 "batch_host_queue_size": 8,
                                 "compute_threads": 2}
    d["training"]["logs_per_epoch"] = 10
    d["storage"]["shuffle_input"] = True
    d["storage"]["full_graph_evaluation"] = True
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_config(d)
    msgs = [str(x.message) for x in w]
    assert any("batch_host_queue_size" in m for m in msgs)
    assert any("compute_threads" in m for m in msgs)
    assert any("logs_per_epoch" in m for m in msgs)
    assert any("shuffle_input" in m for m in msgs)
    assert any("full_graph_evaluation" in m for m in msgs)
    # the honored pipeline keys still work and don't warn
    assert cfg.training.sync is False and cfg.training.staleness_bound == 4
    assert not any("'training.pipeline.sync'" in m for m in msgs)


def test_check_compat_keys_covers_nested_layers():
    """Per-layer / decoder optimizer blocks are now honored (grouped
    optimizers), so they must NOT emit compat warnings."""
    d = _base()
    d["model"]["encoder"]["layers"][0][0]["optimizer"] = {
        "type": "ADAM", "options": {"learning_rate": 0.1}}
    d["model"]["decoder"]["optimizer"] = {"type": "ADAM"}
    msgs = check_compat_keys(d)
    assert not any("optimizer" in m for m in msgs)


def test_compat_keys_quiet_on_clean_config():
    assert check_compat_keys(_base()) == []


@needs_reference
def test_reference_fb15k_yaml_trains_end_to_end(tmp_path):
    """The reference's shipped fb15k_237.yaml runs VERBATIM through
    marius_train (only dataset_dir/model_dir/epochs redirected) on an
    fb15k-shaped synthetic in the same binary layout — the full switch-over
    workflow a reference user follows."""
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_lp

    raw = yaml.safe_load(open(EXAMPLES / "fb15k_237.yaml"))
    ds = str(tmp_path / "ds")
    generate_random_dataset_lp(ds, num_nodes=80, num_edges=800,
                               num_relations=6)
    raw["storage"]["dataset"]["dataset_dir"] = ds
    raw["storage"]["model_dir"] = str(tmp_path / "model_0")
    raw["training"]["num_epochs"] = 2
    raw["training"]["batch_size"] = 100           # 800 edges, not 272k
    raw["training"]["negative_sampling"]["negatives_per_positive"] = 20
    raw["evaluation"]["batch_size"] = 100

    res = marius_train(load_config(raw))
    assert len(res["epochs"]) == 2
    assert 0.0 < res["test"]["mrr"] <= 1.0
    assert (tmp_path / "model_0" / "meta.yaml").exists()


@needs_reference
def test_reference_arxiv_yaml_trains_end_to_end(tmp_path):
    """Same for the reference's ogbn_arxiv.yaml (3-layer GraphSAGE, ALL
    sampling) on an arxiv-shaped synthetic NC dataset — exercises the
    exact-ALL path the reference's headline NC config uses."""
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_nc

    raw = yaml.safe_load(open(EXAMPLES / "ogbn_arxiv.yaml"))
    ds = str(tmp_path / "ds_nc")
    generate_random_dataset_nc(ds, num_nodes=120, num_edges=800,
                               num_classes=6, feature_dim=16)
    raw["storage"]["dataset"]["dataset_dir"] = ds
    raw["storage"]["model_dir"] = str(tmp_path / "model_nc")
    raw["training"]["num_epochs"] = 2
    raw["training"]["batch_size"] = 40
    raw["evaluation"]["batch_size"] = 40
    # shrink the reference's d=128 layers to the synthetic's feature_dim
    for stage in raw["model"]["encoder"]["layers"]:
        for layer in stage:
            for k in ("input_dim", "output_dim"):
                if layer.get(k, -1) > 16:
                    layer[k] = 16
    last = raw["model"]["encoder"]["layers"][-1][-1]
    last["output_dim"] = 6

    res = marius_train(load_config(raw))
    assert len(res["epochs"]) == 2
    assert 0.0 <= res["test"]["accuracy"] <= 1.0
