"""CLI smoke tests (in-process main())."""

import os

import numpy as np
import pytest

from matfac_tpu import cli
from matfac_tpu.data import io as mfio
from matfac_tpu.data.synthetic import synthetic_data


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    data, uf, vf = synthetic_data(n_users=60, n_items=45, k=3,
                                  density=0.35, seed=5, noise=0.05,
                                  nonneg=True)
    paths = {}
    for name, mat in [("train", data.train_mat), ("test", data.test_mat),
                      ("val", data.val_mat)]:
        p = str(d / f"{name}.csr")
        mfio.write_csr(mat, p)
        paths[name] = p
    mfio.write_factor_mat(uf, str(d / "gu.mat"))
    mfio.write_factor_mat(vf, str(d / "gi.mat"))
    paths["gu"] = str(d / "gu.mat")
    paths["gi"] = str(d / "gi.mat")
    paths["dir"] = str(d)
    return paths


def test_cli_train_als(files, capsys):
    rc = cli.main([
        "--cpu", "--algo", "mf", "--mf_method", "als",
        "--trainmat", files["train"], "--testmat", files["test"],
        "--valmat", files["val"], "--facdim", "3", "--maxiter", "6",
        "--ureg", "0.05", "--ireg", "0.05",
        "--prefix", os.path.join(files["dir"], "m")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RE Test RMSE:" in out
    assert "Test RMSE by quartile" in out
    # checkpoint written
    assert any(f.startswith("m_uFac") for f in os.listdir(files["dir"]))


def test_cli_analyze(files, capsys):
    rc = cli.main([
        "--cpu", "--mode", "analyze",
        "--trainmat", files["train"], "--testmat", files["test"],
        "--valmat", files["val"], "--facdim", "3", "--svdfacdim", "3",
        "--initufac", files["gu"], "--initifac", files["gi"],
        "--origufac", files["gu"], "--origifac", files["gi"]])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Freq-RMSE sweep" in out
    assert "PPR-vs-GPR" in out
    # ground truth vs itself -> zero recovery error
    assert "fullLowRankErr vs ground truth: 0.0" in out


def test_cli_train_increment(files, capsys):
    """--algo increment is dispatchable from the CLI (round-2 wiring);
    probe set comes from --graphmat (modelIncrement.cpp:251-316)."""
    rc = cli.main([
        "--cpu", "--algo", "increment",
        "--trainmat", files["train"], "--testmat", files["test"],
        "--valmat", files["val"], "--graphmat", files["val"],
        "--facdim", "6", "--maxiter", "12", "--learnrate", "0.05",
        "--ureg", "0.01", "--ireg", "0.01",
        "--prefix", os.path.join(files["dir"], "inc")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RE Test RMSE:" in out
    assert "increment ranks:" in out
