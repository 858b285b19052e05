"""Tooling + profiler + sharded-checkpoint tests."""

import numpy as np
import pytest

from matfac_tpu import tools
from matfac_tpu.data.synthetic import low_rank_ratings


def test_convert_scipy_npz(tmp_path):
    import scipy.sparse as sp
    mat, _, _ = low_rank_ratings(20, 15, 3, density=0.3, seed=0)
    m = sp.csr_matrix(mat.to_dense())
    npz = str(tmp_path / "m.npz")
    sp.save_npz(npz, m)
    out = str(tmp_path / "m.csr")
    back = tools.convert_scipy_npz(npz, out)
    np.testing.assert_allclose(back.to_dense(), mat.to_dense(),
                               rtol=1e-5)
    from matfac_tpu.data.io import read_csr
    np.testing.assert_allclose(read_csr(out).to_dense(), mat.to_dense(),
                               rtol=1e-4, atol=1e-4)


def test_snap_graph(tmp_path):
    mat, _, _ = low_rank_ratings(10, 10, 2, density=0.3, seed=1)
    p = str(tmp_path / "g.snap")
    tools.to_snap_graph(mat, p)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("# Nodes:")
    assert len(lines) - 1 == 2 * mat.nnz


def test_log_parsing_and_averaging(tmp_path):
    log1 = ("epoch 0: obj 1.0e+03 val_rmse 2.5 lr 0.1 3ms\n"
            "epoch 1: obj 5.0e+02 val_rmse 1.5 lr 0.1 3ms\n")
    log2 = "epoch 0: obj 9.0e+02 val_rmse 2.1 lr 0.1 3ms\n"
    p1, p2 = str(tmp_path / "a.log"), str(tmp_path / "b.log")
    open(p1, "w").write(log1)
    open(p2, "w").write(log2)
    recs = tools.parse_training_logs(log1)
    assert recs[1]["val_rmse"] == 1.5
    avg = tools.average_log_values([p1, p2])
    assert avg == pytest.approx((1.5 + 2.1) / 2)
    hr = tools.parse_training_logs("epoch 3: HR 0.45 best 0.5\n")
    assert hr[0]["hr"] == 0.45


def test_gen_sweep_jobs(tmp_path):
    cmds = tools.gen_sweep_jobs(
        "python -m matfac_tpu.cli --trainmat t.csr",
        {"facdim": [5, 10], "learnrate": [0.001, 0.01, 0.1]},
        out_dir=str(tmp_path), prefix="j")
    assert len(cmds) == 6
    assert (tmp_path / "j_5.sh").exists()
    assert "--facdim 5" in cmds[0] and "--learnrate 0.001" in cmds[0]


def test_throughput_meter():
    from matfac_tpu.train.profiler import ThroughputMeter
    m = ThroughputMeter(nnz=1000, n_chips=2)
    import time
    for _ in range(3):
        with m:
            time.sleep(0.005)
    assert m.ratings_per_sec > 0
    assert m.ratings_per_sec_per_chip == pytest.approx(
        m.ratings_per_sec / 2)
    assert "epochs" in m.summary()


def test_sharded_checkpoint_roundtrip(tmp_path):
    import jax
    from matfac_tpu.config import Params
    from matfac_tpu.models.base import init_state
    from matfac_tpu.parallel.mesh import make_mesh, shard_state
    from matfac_tpu.train import checkpoint as ck

    p = Params(fac_dim=4)
    mesh = make_mesh((8,), ("u",))
    state = shard_state(init_state(p, 64, 32), mesh, "u", "u")
    ck.save_sharded(str(tmp_path / "ck"), state, epoch=np.int64(7))
    blank = shard_state(init_state(p, 64, 32, seed=9), mesh, "u", "u")
    back, extra = ck.restore_sharded(str(tmp_path / "ck"), blank)
    np.testing.assert_allclose(np.asarray(back.u_fac),
                               np.asarray(state.u_fac))
    assert back.u_fac.sharding.spec == state.u_fac.sharding.spec
    assert extra["epoch"] == 7
