"""Tool-layer tests: converter, partitioner, CLIs, predict, postprocess,
config generator, db2graph (reference: test/python/preprocessing +
predict/test_predict.py + postprocessing/test_in_memory_exporter.py)."""

import os
import sqlite3

import numpy as np
import pytest

from marius_tpu.storage.dataset import load_split, load_stats
from marius_tpu.tools.cli import (
    main as cli_main,
    marius_config_generator,
    marius_env_info,
    marius_postprocess,
    marius_predict,
    marius_preprocess,
    marius_train,
)
from marius_tpu.tools.preprocess.converter import EdgeListConverter
from marius_tpu.tools.preprocess.partitioner import (
    partition_edges,
    read_partition_offsets,
)


def _write_raw_triples(path, n=200, nodes=40, rels=4, seed=0, delim="\t"):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(n):
            s, r, d = (rng.integers(0, nodes), rng.integers(0, rels),
                       rng.integers(0, nodes))
            f.write(f"n{s}{delim}r{r}{delim}n{d}\n")


def test_converter_remap_and_splits(tmp_path):
    raw = tmp_path / "raw.tsv"
    _write_raw_triples(raw)
    out = tmp_path / "ds"
    result = EdgeListConverter(
        output_dir=str(out), train_edges=str(raw),
        splits=(0.8, 0.1, 0.1)).convert()
    stats = load_stats(str(out))
    assert stats.num_train == 160 and stats.num_valid == 20
    train = load_split(str(out), "train", stats)
    assert train.shape == (160, 3)
    # remapped ids are dense
    assert train.min() >= 0
    assert train[:, [0, 2]].max() < stats.num_nodes
    assert train[:, 1].max() < stats.num_relations
    # mapping file written and bijective
    mapping = result.node_mapping
    assert len(np.unique(mapping[:, 1])) == stats.num_nodes


def test_converter_no_remap(tmp_path):
    edges = np.random.default_rng(0).integers(0, 30, (100, 3)).astype(np.int64)
    out = tmp_path / "ds"
    EdgeListConverter(output_dir=str(out), train_edges=edges, format="numpy",
                      remap_ids=False, num_nodes=30, num_rels=30,
                      splits=(1.0,)).convert()
    train = load_split(str(out), "train")
    np.testing.assert_array_equal(np.sort(train, axis=0),
                                  np.sort(edges.astype(np.int32), axis=0))


def test_partitioner_buckets():
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 64, (500, 3)).astype(np.int32)
    reordered, sizes = partition_edges(edges, num_nodes=64, num_partitions=4)
    assert sizes.sum() == 500 and len(sizes) == 16
    psize = 16
    # bucket runs are contiguous in row-major (src_bucket, dst_bucket) order
    flat = (reordered[:, 0] // psize) * 4 + reordered[:, -1] // psize
    assert np.all(np.diff(flat) >= 0)
    # same multiset of edges
    np.testing.assert_array_equal(
        np.sort(edges.view([('', np.int32)] * 3).ravel()),
        np.sort(reordered.view([('', np.int32)] * 3).ravel()))


def test_preprocess_cli_partitioned(tmp_path):
    raw = tmp_path / "raw.tsv"
    _write_raw_triples(raw)
    out = tmp_path / "ds"
    rc = marius_preprocess(["--edges", str(raw), "--output_directory", str(out),
                            "--dataset_split", "0.8", "0.1", "0.1",
                            "--num_partitions", "4"])
    assert rc == 0
    sizes = read_partition_offsets(str(out / "edges" / "train_partition_offsets.txt"))
    assert sizes.sum() == 160


def test_sequential_train_nodes(tmp_path):
    edges = np.random.default_rng(0).integers(0, 50, (300, 2)).astype(np.int64)
    train_nodes = np.arange(37, 50)  # raw ids of "train" nodes
    out = tmp_path / "ds"
    res = EdgeListConverter(
        output_dir=str(out), train_edges=edges, format="numpy",
        edge_type_column=None, dst_column=1, splits=(1.0,),
        sequential_train_nodes=True, known_node_ids=[train_nodes]).convert()
    mapping = {int(r): int(n) for r, n in res.node_mapping}
    got = sorted(mapping[t] for t in train_nodes)
    assert got == list(range(len(train_nodes)))


def test_sequential_deg_nodes(tmp_path):
    """Top-k highest-degree nodes get sequential ids [0, k) in degree order
    (torch_converter.py:101,265-330 sequential_deg_nodes)."""
    rng = np.random.default_rng(1)
    # node 7 appears most, then 3, then 11
    hot = np.array([[7, 3]] * 30 + [[3, 11]] * 20 + [[11, 7]] * 10)
    rest = rng.integers(12, 40, (100, 2))
    edges = np.concatenate([hot, rest]).astype(np.int64)
    out = tmp_path / "ds_deg"
    res = EdgeListConverter(
        output_dir=str(out), train_edges=edges, format="numpy",
        edge_type_column=None, dst_column=1, splits=(1.0,),
        sequential_deg_nodes=3).convert()
    mapping = {int(r): int(n) for r, n in res.node_mapping}
    # degrees: 7 -> 40, 3 -> 50, 11 -> 30 => order 3, 7, 11
    assert mapping[3] == 0 and mapping[7] == 1 and mapping[11] == 2
    assert all(v >= 3 for r, v in mapping.items() if r not in (3, 7, 11))


def test_sequential_train_and_deg_union(tmp_path):
    edges = np.random.default_rng(2).integers(0, 30, (400, 2)).astype(np.int64)
    train_nodes = np.arange(25, 30)
    out = tmp_path / "ds_both"
    res = EdgeListConverter(
        output_dir=str(out), train_edges=edges, format="numpy",
        edge_type_column=None, dst_column=1, splits=(1.0,),
        sequential_train_nodes=True, sequential_deg_nodes=4,
        known_node_ids=[train_nodes]).convert()
    mapping = {int(r): int(n) for r, n in res.node_mapping}
    seq_ids = {mapping[t] for t in train_nodes}
    # all train nodes are inside the sequential prefix (union with top-deg)
    assert max(seq_ids) < len(train_nodes) + 4


def test_model_dir_auto_versioning(tmp_path):
    """load_config picks the next free model_<i> instead of silently
    overwriting model_0 (marius_config.py:47-56)."""
    from marius_tpu.config.schema import load_config
    from marius_tpu.tools.preprocess import generate_random_dataset_lp
    ds = str(tmp_path / "ds_mv")
    generate_random_dataset_lp(ds, num_nodes=20, num_edges=100,
                               num_relations=2)
    raw = {
        "model": {"learning_task": "LINK_PREDICTION",
                  "encoder": {"layers": [[{"type": "EMBEDDING",
                                           "output_dim": 8}]]},
                  "decoder": {"type": "DISTMULT", "options": {"input_dim": 8}}},
        "storage": {"dataset": {"dataset_dir": ds}},
        "training": {"batch_size": 50, "num_epochs": 1,
                     "negative_sampling": {"num_chunks": 2,
                                           "negatives_per_positive": 4}},
        "evaluation": {"batch_size": 50},
    }
    cfg0 = load_config(dict(raw))
    assert cfg0.storage.model_dir.endswith("model_0")
    os.makedirs(os.path.join(ds, "model_0"))
    cfg1 = load_config(dict(raw))
    assert cfg1.storage.model_dir.endswith("model_1")
    for i in range(1, 11):
        os.makedirs(os.path.join(ds, f"model_{i}"), exist_ok=True)
    cfg_sat = load_config(dict(raw))
    assert cfg_sat.storage.model_dir.endswith("model_10")  # saturates


def _train_tiny_model(tmp_path):
    import yaml
    from marius_tpu.tools.preprocess import generate_random_dataset_lp
    ds = str(tmp_path / "ds")
    generate_random_dataset_lp(ds, num_nodes=40, num_edges=400, num_relations=4)
    raw = {
        "model": {
            "learning_task": "LINK_PREDICTION",
            "encoder": {"layers": [[{"type": "EMBEDDING", "output_dim": 8}]]},
            "decoder": {"type": "DISTMULT", "options": {"input_dim": 8}},
            "loss": {"type": "SOFTMAX_CE"},
            "dense_optimizer": {"type": "ADAM", "options": {"learning_rate": 0.1}},
        },
        "storage": {"dataset": {"dataset_dir": ds},
                    "model_dir": str(tmp_path / "model_0"), "save_model": True},
        "training": {"batch_size": 40,
                     "negative_sampling": {"num_chunks": 2,
                                           "negatives_per_positive": 8},
                     "num_epochs": 1},
        "evaluation": {"batch_size": 40,
                       "negative_sampling": {"filtered": True}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    return cfg_path, ds


def test_train_predict_postprocess_cli(tmp_path, capsys):
    cfg_path, ds = _train_tiny_model(tmp_path)
    assert marius_train([cfg_path]) == 0
    out = str(tmp_path / "pred")
    assert marius_predict(["--config", cfg_path, "--output_dir", out,
                           "--save_ranks", "--save_scores"]) == 0
    ranks = np.loadtxt(os.path.join(out, "ranks.csv"), delimiter=",")
    assert ranks.shape[0] == load_stats(ds).num_test
    assert os.path.exists(os.path.join(out, "metrics.txt"))

    emb_out = str(tmp_path / "emb")
    assert marius_postprocess(["--model_dir", str(tmp_path / "model_0"),
                               "--output_dir", emb_out]) == 0
    lines = open(os.path.join(emb_out, "embeddings.csv")).readlines()
    assert len(lines) >= 40  # table has a sentinel row


def test_partition_buffer_sizing():
    from marius_tpu.tools.config_generator import size_partition_buffer
    # fits in HBM: no buffer
    assert size_partition_buffer(1_000_000, 50, hbm_bytes=16e9) is None
    # freebase86m shape: 86M x d=50 f32 + Adagrad = 34.4 GB on a 16 GB chip
    sized = size_partition_buffer(86_000_000, 50, hbm_bytes=16e9)
    assert sized is not None
    n, c = sized["num_partitions"], sized["buffer_capacity"]
    resident = c / n * 86_000_000 * 50 * 4 * 2
    assert resident <= 16e9 * 0.6  # fits the working fraction
    assert n % 2 == 0 and c % 2 == 0 and c >= 4  # COMET-compatible
    assert n <= 64  # minimal: no gratuitous swap traffic
    # 10x the table, tiny chip: still a valid schedule
    sized2 = size_partition_buffer(860_000_000, 100, hbm_bytes=8e9)
    assert sized2["buffer_capacity"] / sized2["num_partitions"] \
        * 860_000_000 * 100 * 4 * 2 <= 8e9 * 0.6


def test_config_generator_auto_sizing(tmp_path):
    """Generated config for a big-table dataset includes a sized
    PARTITION_BUFFER tier; a small one stays in device memory."""
    import yaml
    from marius_tpu.storage.dataset import DatasetStats, save_stats
    from marius_tpu.tools.config_generator import generate_config
    big = str(tmp_path / "big")
    os.makedirs(big)
    save_stats(big, DatasetStats(num_nodes=90_000_000, num_edges=300_000_000,
                                 num_relations=10, num_train=300_000_000))
    raw = generate_config(big, embedding_dim=100, hbm_bytes=16e9)
    emb = raw["storage"]["embeddings"]
    assert emb["type"] == "PARTITION_BUFFER"
    assert emb["options"]["num_partitions"] > emb["options"]["buffer_capacity"]
    small = str(tmp_path / "small")
    os.makedirs(small)
    save_stats(small, DatasetStats(num_nodes=10_000, num_edges=100_000,
                                   num_relations=10, num_train=100_000))
    raw2 = generate_config(small, embedding_dim=50, hbm_bytes=16e9)
    assert "embeddings" not in raw2["storage"]


def test_config_generator_roundtrip(tmp_path):
    from marius_tpu.config.schema import load_config
    from marius_tpu.tools.preprocess import generate_random_dataset_lp
    ds = str(tmp_path / "ds")
    generate_random_dataset_lp(ds, num_nodes=40, num_edges=200, num_relations=4)
    out = str(tmp_path / "gen.yaml")
    assert marius_config_generator([ds, "--output", out, "--model", "COMPLEX"]) == 0
    cfg = load_config(out)
    assert cfg.model.decoder.decoder_type == "COMPLEX"
    assert cfg.storage.dataset.num_nodes == 40


def test_env_info_cli(capsys):
    assert marius_env_info([]) == 0
    assert "marius_tpu" in capsys.readouterr().out


def test_db2graph_sqlite(tmp_path):
    import yaml
    db = str(tmp_path / "g.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE follows (a TEXT, rel TEXT, b TEXT)")
    conn.executemany("INSERT INTO follows VALUES (?,?,?)",
                     [("u1", "follows", "u2"), ("u2", "follows", "u3")])
    conn.commit()
    conn.close()
    cfg = {"db_type": "sqlite", "connection": {"database": db},
           "edge_queries": ["SELECT a, rel, b FROM follows"]}
    cfg_path = str(tmp_path / "db.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    rc = cli_main(["db2graph", "--config_path", cfg_path,
                   "--output_directory", str(tmp_path / "out")])
    assert rc == 0
    lines = open(tmp_path / "out" / "edges.txt").read().strip().split("\n")
    assert lines == ["u1\tfollows\tu2", "u2\tfollows\tu3"]


def test_dataset_registry_complete():
    from marius_tpu.tools.preprocess.datasets import DATASET_REGISTRY
    expected = {"fb15k", "fb15k_237", "freebase86m", "livejournal", "twitter",
                "friendster", "ogbl_ppa", "ogbl_collab", "ogbl_citation2",
                "ogbl_wikikg2", "ogbn_arxiv", "ogbn_products",
                "ogbn_papers100m", "ogb_mag240m", "ogb_wikikg90mv2"}
    assert expected <= set(DATASET_REGISTRY)


def test_converter_edge_weights(tmp_path):
    rng = np.random.default_rng(5)
    raw = tmp_path / "w.tsv"
    with open(raw, "w") as f:
        for i in range(100):
            f.write(f"n{rng.integers(0, 20)}\tr0\tn{rng.integers(0, 20)}"
                    f"\t{rng.random():.4f}\n")
    out = tmp_path / "ds"
    EdgeListConverter(
        output_dir=str(out), train_edges=str(raw), splits=(1.0,),
        edge_weight_column=3, num_partitions=2).convert()
    w = np.fromfile(out / "edges" / "train_edges_weights.bin", np.float32)
    assert w.shape == (100,)
    assert ((0 <= w) & (w < 1)).all()


def test_weighted_partitioned_buckets_are_correct(tmp_path):
    """Regression: the weight-tracking reorder must not disturb bucketing."""
    rng = np.random.default_rng(7)
    edges = rng.integers(0, 40, (200, 2)).astype(np.int64)
    w = rng.random(200).astype(np.float32)
    arr = np.concatenate([edges[:, :1], w[:, None].astype(np.int64) * 0 + 1,
                          edges[:, 1:]], axis=1)  # dummy to carry via numpy fmt
    out = tmp_path / "ds"
    # write raw file with weights as 4th column
    raw = tmp_path / "raw.tsv"
    with open(raw, "w") as f:
        for (s, d), ww in zip(edges, w):
            f.write(f"{s}\t0\t{d}\t{ww:.6f}\n")
    EdgeListConverter(output_dir=str(out), train_edges=str(raw), splits=(1.0,),
                      edge_weight_column=3, num_partitions=4,
                      remap_ids=False, num_nodes=40).convert()
    train = load_split(str(out), "train")
    sizes = read_partition_offsets(str(out / "edges" / "train_partition_offsets.txt"))
    psize = 10
    flat = (train[:, 0] // psize) * 4 + train[:, -1] // psize
    assert np.all(np.diff(flat) >= 0), "bucket runs not contiguous"
    np.testing.assert_array_equal(np.bincount(flat, minlength=16), sizes)


def test_single_relation_typed_dataset_roundtrip(tmp_path):
    """Regression: typed datasets with exactly ONE relation keep 3 columns."""
    raw = tmp_path / "raw.tsv"
    with open(raw, "w") as f:
        for i in range(30):
            f.write(f"a{i}\tonly_rel\tb{i}\n")
    out = tmp_path / "ds"
    EdgeListConverter(output_dir=str(out), train_edges=str(raw),
                      splits=(1.0,)).convert()
    stats = load_stats(str(out))
    assert stats.num_relations == 1 and stats.num_edge_cols == 3
    train = load_split(str(out), "train", stats)
    assert train.shape == (30, 3)
    assert (train[:, 1] == 0).all()


def test_predict_raw_input_mapping(tmp_path):
    """marius_predict on a RAW delimited input file: ids map through the
    dataset's node/relation mapping files (run_predict raw-input path)."""
    import yaml
    from marius_tpu.tools.predict import _load_input_edges

    raw = tmp_path / "raw.tsv"
    _write_raw_triples(raw, n=100, nodes=20, rels=3, seed=1)
    ds = tmp_path / "ds"
    EdgeListConverter(output_dir=str(ds), train_edges=str(raw),
                      splits=(1.0,)).convert()
    # new raw file with known entities
    q = tmp_path / "query.tsv"
    with open(q, "w") as f:
        f.write("n1\tr0\tn2\nn3\tr1\tn4\n")
    edges = _load_input_edges(str(q), str(ds))
    assert edges.shape == (2, 3)
    stats = load_stats(str(ds))
    assert (edges >= 0).all()
    assert edges[:, [0, 2]].max() < stats.num_nodes
    # mapping consistency: same raw id -> same mapped id as the training data
    nm = np.genfromtxt(ds / "nodes" / "node_mapping.txt", delimiter=",", dtype=str)
    node_map = dict(zip(nm[:, 0], nm[:, 1].astype(int)))
    assert edges[0, 0] == node_map["n1"] and edges[1, 2] == node_map["n4"]


def test_export_encoded_nodes_config(tmp_path):
    import yaml
    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_lp

    ds = str(tmp_path / "ds")
    generate_random_dataset_lp(ds, num_nodes=40, num_edges=300, num_relations=4)
    raw = {
        "model": {
            "learning_task": "LINK_PREDICTION",
            "encoder": {"layers": [[{"type": "EMBEDDING", "output_dim": 8}]]},
            "decoder": {"type": "DISTMULT", "options": {"input_dim": 8}},
            "loss": {"type": "SOFTMAX_CE"},
            "dense_optimizer": {"type": "ADAM", "options": {"learning_rate": 0.1}},
        },
        "storage": {"dataset": {"dataset_dir": ds},
                    "model_dir": str(tmp_path / "m0"),
                    "export_encoded_nodes": True},
        "training": {"batch_size": 50,
                     "negative_sampling": {"num_chunks": 2,
                                           "negatives_per_positive": 8},
                     "num_epochs": 1},
        "evaluation": {"batch_size": 50,
                       "negative_sampling": {"filtered": False, "num_chunks": 2,
                                             "negatives_per_positive": 8}},
    }
    marius_train(load_config(raw))
    encoded = np.fromfile(tmp_path / "m0" / "encoded_nodes.bin", np.float32)
    assert encoded.shape == (40 * 8,)


# ---------------------------------------------------------------------------
# Chunked out-of-core converter (reference SparkEdgeListConverter regime)
# ---------------------------------------------------------------------------


def test_chunked_converter_matches_in_memory(tmp_path):
    """Tiny chunks (forcing many streaming passes) produce a dataset
    equivalent to the in-memory converter: same id space, same edge multiset
    under the mapping, sane split sizes."""
    from marius_tpu.tools.preprocess.chunked_converter import (
        ChunkedEdgeListConverter,
    )

    raw = tmp_path / "raw.tsv"
    _write_raw_triples(raw, n=1000, nodes=80, rels=6)
    out = tmp_path / "ds_chunked"
    result = ChunkedEdgeListConverter(
        output_dir=str(out), train_edges=str(raw),
        splits=(0.8, 0.1, 0.1), chunk_rows=64).convert()
    stats = load_stats(str(out))
    assert stats.num_nodes == 80 and stats.num_relations == 6
    assert stats.num_train + stats.num_valid + stats.num_test == 1000
    # random per-row split: fractions within loose binomial bounds
    assert 700 <= stats.num_train <= 900
    train = load_split(str(out), "train", stats)
    assert train.min() >= 0 and train[:, [0, 2]].max() < 80
    # mapping bijective
    assert len(np.unique(result.node_mapping[:, 1])) == 80

    # reconstruct raw edges via the inverse mapping: multiset must equal input
    inv_n = {int(v): k for k, v in result.node_mapping}
    inv_r = {int(v): k for k, v in result.relation_mapping}
    got = set()
    for split in ("train", "validation", "test"):
        e = load_split(str(out), {"validation": "valid"}.get(split, split), stats)
        for s, r, d in e:
            got.add((inv_n[int(s)], inv_r[int(r)], inv_n[int(d)]))
    want = set()
    for line in open(raw):
        s, r, d = line.strip().split("\t")
        want.add((s, r, d))
    assert got == want


def test_chunked_converter_partitioned(tmp_path):
    """Out-of-core counting-sort partitioning groups buckets contiguously in
    row-major order with correct offsets, across many chunks."""
    from marius_tpu.tools.preprocess.chunked_converter import (
        ChunkedEdgeListConverter,
    )

    rng = np.random.default_rng(3)
    edges = rng.integers(0, 64, (2000, 3)).astype(np.int64)
    src = tmp_path / "e.npy"
    np.save(src, edges)
    out = tmp_path / "ds_part"
    ChunkedEdgeListConverter(
        output_dir=str(out), train_edges=str(src), format="npy",
        remap_ids=False, num_nodes=64, num_rels=64, splits=(1.0,),
        num_partitions=4, chunk_rows=128).convert()
    stats = load_stats(str(out))
    train = load_split(str(out), "train", stats)
    sizes = read_partition_offsets(
        str(out / "edges" / "train_partition_offsets.txt"))
    assert sizes.sum() == 2000 and len(sizes) == 16
    flat = (train[:, 0] // 16) * 4 + train[:, -1] // 16
    assert np.all(np.diff(flat) >= 0), "buckets not contiguous"
    np.testing.assert_array_equal(np.bincount(flat, minlength=16), sizes)
    # same multiset as input
    np.testing.assert_array_equal(
        np.sort(train.view([('', np.int32)] * 3).ravel()),
        np.sort(edges.astype(np.int32).view([('', np.int32)] * 3).ravel()))


def test_chunked_converter_cli(tmp_path):
    raw = tmp_path / "raw.tsv"
    _write_raw_triples(raw, n=300)
    out = tmp_path / "ds_cli"
    rc = marius_preprocess(["--edges", str(raw), "--output_directory", str(out),
                            "--dataset_split", "0.9", "0.05", "0.05",
                            "--chunked", "--chunk_rows", "50"])
    assert rc == 0
    stats = load_stats(str(out))
    assert stats.num_train + stats.num_valid + stats.num_test == 300


def test_db2graph_entity_entity_reference_config(tmp_path):
    """The reference's config spelling + entity-entity pipeline
    (marius_db2graph.py:104 config_parser_fn, :173 validation, :295
    post_processing): alternating rel/query file, table_column-prefixed
    node ids, token cleaning, invalid-entry drop, per-batch dedup."""
    import yaml

    db = str(tmp_path / "g.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE person (pid TEXT, city TEXT)")
    conn.executemany("INSERT INTO person VALUES (?,?)", [
        ("U1 ", "NYC"),        # token cleaning: strip + lower
        ("u2", "0"),           # invalid dst -> dropped
        ("u3", "paris"),
        ("u3", "paris"),       # duplicate -> dropped
    ])
    conn.commit()
    conn.close()

    qfile = str(tmp_path / "queries.txt")
    with open(qfile, "w") as f:
        f.write("lives_in\nSELECT person.pid, person.city FROM person\n")
    cfg = {"db_server": "sqlite", "db_name": db, "db_user": None,
           "db_password": None, "db_host": None, "edges_queries": qfile}
    # sqlite's connect takes only database=; run_db2graph maps db_name to it
    cfg_path = str(tmp_path / "db.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from marius_tpu.tools.db2graph import run_db2graph
    out = run_db2graph(cfg_path, str(tmp_path / "out"))
    lines = sorted(open(out).read().strip().split("\n"))
    assert lines == [
        "person_pid_u1\tlives_in\tperson_city_nyc",
        "person_pid_u3\tlives_in\tperson_city_paris",
    ]


def test_db2graph_query_validation():
    from marius_tpu.tools.db2graph import validate_entity_entity_query

    t1, c1, t2, c2 = validate_entity_entity_query(
        "SELECT a.x, b.y FROM a JOIN b ON a.k = b.k")
    assert (t1, c1, t2, c2) == ("a", "x", "b", "y")
    with pytest.raises(ValueError, match="AS"):
        validate_entity_entity_query("SELECT a.x AS z, b.y FROM a")
    with pytest.raises(ValueError, match="SELECT"):
        validate_entity_entity_query("UPDATE a.x, b.y FROM a")
    with pytest.raises(ValueError, match="','"):
        validate_entity_entity_query("SELECT a.x b.y FROM a")
    with pytest.raises(ValueError, match="table1.col1"):
        validate_entity_entity_query("SELECT ax, b.y FROM a")
    with pytest.raises(ValueError, match="FROM"):
        validate_entity_entity_query("SELECT a.x, b.y c.z FROM a")
