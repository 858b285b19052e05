"""Worker process for the 2-process jax.distributed Block-DSGD test.

Each process creates 4 virtual CPU devices (8-device global mesh),
loads ONLY its host-local rating rows and builds BlockDSGDSolver —
which must stage only the cells of its addressable shard blocks and
still agree bit-for-bit with a single process staging everything
(process-independent permutations via allgathered frequencies +
pair-hash within-cell shuffle; parallel/block_dsgd.py docstring).

Usage: python block_dsgd_worker.py <coordinator_port> <process_id> <out_dir>
"""

import os
import sys


def main():
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    from jax.sharding import Mesh

    from matfac_tpu.config import Params
    from matfac_tpu.data.csr import RatingMatrix
    from matfac_tpu.data.synthetic import synthetic_data
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.parallel.block_dsgd import BlockDSGDSolver
    from matfac_tpu.parallel.distributed import host_local_ratings
    from matfac_tpu.utils import freq as ufreq

    data, _, _ = synthetic_data(n_users=64, n_items=48, k=3,
                                density=0.3, seed=11, noise=0.05,
                                nonneg=True)
    n_users, n_items = data.n_users, data.n_items
    iu, ii = ufreq.invalid_users_items(data.train_mat, n_users, n_items)
    params = Params(fac_dim=3, u_reg=0.02, i_reg=0.02, learn_rate=0.03,
                    batch_size=16, seed=3)

    # this process keeps ONLY the rows of its 4 user blocks
    r, c, v = host_local_ratings(data.train_mat, n_users, 2, pid)
    local_mat = RatingMatrix.from_coo(r, c, v, n_users, n_items)

    mesh = Mesh(np.asarray(jax.devices()), ("u",))
    model = ModelMF(params, n_users, n_items)
    solver = BlockDSGDSolver(model, params, local_mat, iu, ii, mesh,
                             sub_bu=8, sub_bi=4, batch_size=16)
    # staged stream really is per-process: 4 of 8 shard blocks
    assert len(solver.local_blocks) == 4, solver.local_blocks
    assert solver.u_loc.addressable_shards[0].data.shape[0] == 1

    state = init_state(params, n_users, n_items, seed=7)
    key = jax.random.PRNGKey(5)
    for _ in range(2):
        key, ek = jax.random.split(key)
        state = solver.epoch(state, params.learn_rate, ek)

    from jax.experimental import multihost_utils
    u = multihost_utils.process_allgather(state.u_fac, tiled=True)
    i = multihost_utils.process_allgather(state.i_fac, tiled=True)
    if pid == 0:
        np.savez(os.path.join(out_dir, "multi.npz"),
                 u_fac=np.asarray(u), i_fac=np.asarray(i))

    # multi-host sharded checkpoint round-trip (orbax): every process
    # participates in save and restore of the mesh-placed state
    from matfac_tpu.train import checkpoint as ck
    ckpt_dir = os.path.join(out_dir, "orbax_ckpt")
    ck.save_sharded(ckpt_dir, state, epoch=np.int64(2))
    restored, extra = ck.restore_sharded(ckpt_dir, state)
    assert int(extra["epoch"]) == 2
    du = multihost_utils.process_allgather(
        (restored.u_fac - state.u_fac), tiled=True)
    assert float(np.abs(np.asarray(du)).max()) == 0.0
    print("ORBAX_OK", pid)

    jax.distributed.shutdown()
    print("WORKER_OK", pid)


if __name__ == "__main__":
    main()
