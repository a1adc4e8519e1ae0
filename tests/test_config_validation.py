"""Config validation: unknown-key rejection + cross-field checks
(marius_config.py:836 type_safe_merge + __post_init__ parity)."""

import copy

import pytest

from marius_tpu.config.schema import load_config
from marius_tpu.config.validate import ConfigError
from tests.test_manager import LP_BASE, GS_ENCODER


def _base():
    d = copy.deepcopy(LP_BASE)
    d["storage"]["dataset"]["dataset_dir"] = ""
    return d


def test_valid_config_loads():
    load_config(_base())


def test_unknown_key_rejected_with_suggestion():
    d = _base()
    d["training"]["bach_size"] = 50
    with pytest.raises(ConfigError) as ei:
        load_config(d)
    msg = str(ei.value)
    assert "training.bach_size" in msg
    assert "batch_size" in msg  # did-you-mean


def test_unknown_nested_key_rejected():
    d = _base()
    d["model"]["decoder"]["options"]["inpt_dim"] = 8
    with pytest.raises(ConfigError, match="inpt_dim"):
        load_config(d)


def test_unknown_toplevel_section_rejected():
    d = _base()
    d["trainig"] = {"batch_size": 10}
    with pytest.raises(ConfigError, match="trainig"):
        load_config(d)


def test_bad_enum_rejected():
    d = _base()
    d["model"]["decoder"]["type"] = "DISTMULTT"
    with pytest.raises(ConfigError, match="DISTMULTT"):
        load_config(d)


def test_bad_value_rejected():
    d = _base()
    d["training"]["batch_size"] = 0
    with pytest.raises(ConfigError, match="training.batch_size"):
        load_config(d)


def test_gnn_stage_sampling_mismatch():
    d = _base()
    enc = copy.deepcopy(GS_ENCODER)
    enc["train_neighbor_sampling"] = []  # 1 GNN stage, 0 entries
    d["model"]["encoder"] = enc
    with pytest.raises(ConfigError, match="GNN stage"):
        load_config(d)


def test_buffer_capacity_cross_check():
    d = _base()
    d["storage"]["embeddings"] = {
        "type": "PARTITION_BUFFER",
        "options": {"num_partitions": 2, "buffer_capacity": 8}}
    with pytest.raises(ConfigError, match="buffer_capacity"):
        load_config(d)


def test_host_streaming_requires_filtered():
    d = _base()
    d["evaluation"]["host_streaming"] = True
    d["evaluation"]["negative_sampling"] = {"filtered": False}
    with pytest.raises(ConfigError, match="host_streaming"):
        load_config(d)


def test_edges_partition_buffer_rejected():
    d = _base()
    d["storage"]["edges"] = {"type": "PARTITION_BUFFER"}
    with pytest.raises(ConfigError, match="edges"):
        load_config(d)


def test_validate_false_skips():
    d = _base()
    d["training"]["bach_size"] = 50
    load_config(d, validate=False)  # must not raise


def test_multiple_errors_reported_together():
    d = _base()
    d["training"]["bach_size"] = 50
    d["model"]["decoder"]["type"] = "WRONG"
    with pytest.raises(ConfigError) as ei:
        load_config(d)
    msg = str(ei.value)
    assert "bach_size" in msg and "WRONG" in msg


def test_eval_sampling_count_checked():
    d = _base()
    enc = copy.deepcopy(GS_ENCODER)
    enc["eval_neighbor_sampling"] = enc["train_neighbor_sampling"] * 2
    d["model"]["encoder"] = enc
    with pytest.raises(ConfigError, match="eval_neighbor_sampling"):
        load_config(d)


def test_save_best_requires_save_model():
    d = _base()
    d["storage"]["save_model"] = False
    d["training"]["checkpoint"] = {"save_best": True}
    with pytest.raises(ConfigError, match="save_best"):
        load_config(d)


def test_features_dtype_fallback():
    """storage.features.options.dtype drives the compute dtype for
    feature-only (NC) models; an embeddings tier dtype takes precedence."""
    d = _base()
    d["storage"]["features"] = {"type": "DEVICE_MEMORY",
                                "options": {"dtype": "bfloat16"}}
    assert load_config(d).storage.embeddings_dtype == "bfloat16"
    d["storage"]["embeddings"] = {"type": "DEVICE_MEMORY",
                                  "options": {"dtype": "float"}}
    assert load_config(d).storage.embeddings_dtype == "float"
