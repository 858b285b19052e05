"""k=128 block-SGD at the best diag shape + Pallas Mosaic retry.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_k128_pallas.py > /tmp/tpu_k128.log 2>&1 &
"""

import time


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0]))


def main():
    import jax

    from matfac_tpu.config import Params
    from matfac_tpu.data.synthetic import low_rank_ratings
    from matfac_tpu.models.base import ModelMF, init_state
    from matfac_tpu.solvers.block_sgd import BlockSGDSolver
    from matfac_tpu.utils import freq

    print("devices:", jax.devices(), flush=True)
    n_users, n_items = 100_000, 20_000
    mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                                 seed=0, noise=0.1, power_law=0.6,
                                 nonneg=True)
    iu, ii = freq.invalid_users_items(mat, n_users, n_items)
    print(f"nnz={mat.nnz}", flush=True)

    # same-day scatter-SGD reference for device-speed calibration
    from matfac_tpu.solvers.sgd import SGDSolver
    params = Params(fac_dim=64, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.005, seed=0, batch_size=65_536)
    model = ModelMF(params, n_users, n_items)
    s = SGDSolver(model, params, mat, iu, ii)
    st = init_state(params, n_users, n_items)
    key = jax.random.PRNGKey(0)
    key, k1 = jax.random.split(key)
    st = s.epoch(st, 0.005, k1)
    force(st.u_fac)
    times = []
    for _ in range(3):
        key, k1 = jax.random.split(key)
        t0 = time.time()
        st = s.epoch(st, 0.005, k1)
        force(st.u_fac)
        times.append(time.time() - t0)
    print(f"scatter-ref k64: epoch={min(times)*1000:.0f}ms "
          f"(round-1-speed ref 259 ms)", flush=True)

    for label, k, pad, sched, bsz, bu, bi in [
            ("diag k128 b1024 B384", 128, 0, "diag", 1024, 384, 384),
            ("diag k128 b512 B256", 128, 0, "diag", 512, 256, 256),
            ("diag k64pad128 b1024 B384", 64, 128, "diag", 1024, 384,
             384)]:
        params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001,
                        learn_rate=0.005, seed=0)
        model = ModelMF(params, n_users, n_items)
        try:
            s = BlockSGDSolver(model, params, mat, iu, ii,
                               batch_size=bsz, bu=bu, bi=bi,
                               collision_norm=True, schedule=sched,
                               pad_k=pad)
            st = init_state(params, n_users, n_items)
            key = jax.random.PRNGKey(0)
            key, k1 = jax.random.split(key)
            t0 = time.time()
            st = s.epoch(st, 0.005, k1)
            force(st.u_fac)
            c = time.time() - t0
            times = []
            for _ in range(3):
                key, k1 = jax.random.split(key)
                t0 = time.time()
                st = s.epoch(st, 0.005, k1)
                force(st.u_fac)
                times.append(time.time() - t0)
            dt = min(times)
            print(f"{label}: compile={c:.1f}s epoch={dt*1000:.0f}ms "
                  f"rate={s.nnz/dt/1e6:.1f}M ratings/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAIL: {type(e).__name__}: {str(e)[:500]}",
                  flush=True)

    # ---- Pallas Mosaic retry (crashed the remote compile helper in
    # round 2 — HTTP 500; retry in case the toolchain was updated) ----
    params = Params(fac_dim=64, u_reg=0.001, i_reg=0.001,
                    learn_rate=0.005, seed=0)
    model = ModelMF(params, n_users, n_items)
    try:
        s = BlockSGDSolver(model, params, mat, iu, ii, batch_size=2048,
                           bu=1024, bi=1024, collision_norm=True,
                           engine="pallas")
        st = init_state(params, n_users, n_items)
        key = jax.random.PRNGKey(0)
        key, k1 = jax.random.split(key)
        t0 = time.time()
        st = s.epoch(st, 0.005, k1)
        force(st.u_fac)
        c = time.time() - t0
        times = []
        for _ in range(3):
            key, k1 = jax.random.split(key)
            t0 = time.time()
            st = s.epoch(st, 0.005, k1)
            force(st.u_fac)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"PALLAS b2048 bu1024: compile={c:.1f}s "
              f"epoch={dt*1000:.0f}ms rate={s.nnz/dt/1e6:.1f}M "
              f"ratings/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"PALLAS FAIL: {type(e).__name__}: {str(e)[:800]}",
              flush=True)


if __name__ == "__main__":
    main()
