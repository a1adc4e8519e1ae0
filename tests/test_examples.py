"""The shipped Python-API examples must actually run (reference parity:
examples/python/{fb15k_237,custom_lp,custom_nc_graphsage,ogbn_arxiv_nc}.py).
Downloads are stubbed with tiny fabricated raw files."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples" / "python"


def _load(name, argv):
    spec = importlib.util.spec_from_file_location(f"example_{name}",
                                                  EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    old = sys.argv
    sys.argv = [str(EXAMPLES / f"{name}.py"), *argv]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = old
    return mod


@pytest.mark.slow
def test_custom_nc_graphsage_example(tmp_path, capsys, monkeypatch):
    mod = _load("custom_nc_graphsage", [str(tmp_path)])

    # fabricate a tiny CORA-shaped raw dataset instead of downloading
    rng = np.random.default_rng(0)
    n, f = 80, 12
    raw_dir = tmp_path / "cora"
    raw_dir.mkdir(parents=True)
    ids = rng.choice(10_000, size=n, replace=False)
    with open(raw_dir / "cora.content", "w") as fh:
        for i in range(n):
            words = rng.integers(0, 2, size=f)
            cls = mod.CLASS_NAMES[rng.integers(len(mod.CLASS_NAMES))]
            fh.write(f"{ids[i]}\t" + "\t".join(map(str, words)) + f"\t{cls}\n")
    with open(raw_dir / "cora.cites", "w") as fh:
        for _ in range(300):
            a, b = rng.choice(ids, size=2, replace=False)
            fh.write(f"{a}\t{b}\n")

    monkeypatch.setattr(mod.Cora, "download",
                        lambda self, overwrite=False: setattr(
                            self, "cites_file", raw_dir / "cora.cites")
                        or setattr(self, "content_file",
                                   raw_dir / "cora.content"))
    mod.NUM_EPOCHS = 2
    mod.main()
    out = capsys.readouterr().out
    assert "epoch 2" in out and "accuracy" in out


def test_mesh_example_runs(tmp_path, capsys):
    """fb15k_237_mesh.py (the reference's fb15k_237_gpu.py twin) trains and
    evaluates over a real device mesh on a fabricated preprocessed dataset."""
    from marius_tpu.tools.preprocess.generate import generate_random_dataset_lp

    ds = tmp_path / "ds_mesh_example"
    generate_random_dataset_lp(str(ds), num_nodes=60, num_edges=600,
                               num_relations=4)
    mod = _load("fb15k_237_mesh", [str(ds)])
    mod.NUM_EPOCHS = 2
    mod.main()
    out = capsys.readouterr().out
    assert "mesh" in out and "epoch 2" in out and "mrr" in out


def test_examples_import_cleanly():
    for name in ("fb15k_237", "custom_lp", "ogbn_arxiv_nc", "fb15k_237_mesh"):
        _load(name, ["/tmp/nonexistent_dataset_dir"])
