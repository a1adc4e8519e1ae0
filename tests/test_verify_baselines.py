"""The committed baseline-reproduction harness (verdict: one command that
reproduces FB15K-237 MRR / ogbn-arxiv accuracy the moment egress exists;
exercised here end-to-end in zero-egress synthetic mode)."""

import os

import pytest

from marius_tpu.tools.verify_baselines import main, verify_fb15k237

pytestmark = pytest.mark.slow


def test_synthetic_lp_verification_passes(tmp_path):
    r = verify_fb15k237(str(tmp_path), synthetic=True, epochs=10)
    assert r["passed"], r
    assert r["value"] >= r["threshold"]
    # twin dataset is cached for re-runs
    assert os.path.exists(tmp_path / "fb15k_237_synthetic" / "dataset.yaml")


def test_cli_runs_and_reports(tmp_path, capsys):
    rc = main(["--synthetic", "--dataset", "fb15k_237",
               "--data-root", str(tmp_path), "--epochs", "10"])
    out = capsys.readouterr().out
    assert rc == 0
    assert '"dataset": "fb15k_237"' in out and "PASS" in out


def test_real_mode_wiring(tmp_path, monkeypatch):
    """Real (non-synthetic) mode reaches the downloader (zero egress here, so
    we assert the wiring: FB15K237.download is invoked for a fresh dir)."""
    from marius_tpu.tools.preprocess import datasets as ds_mod

    called = {}

    def fake_download(self, overwrite=False):
        called["download"] = True
        raise RuntimeError("no egress")

    monkeypatch.setattr(ds_mod.FB15K237, "download", fake_download)
    with pytest.raises(RuntimeError, match="no egress"):
        verify_fb15k237(str(tmp_path), synthetic=False)
    assert called.get("download")
