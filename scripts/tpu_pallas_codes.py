"""pallas_codes hardware geometry probe (bu/panel/bi argv). First Pallas kernel to run on this toolchain (round 5).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_pallas_codes.py
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.solvers.block_sgd import BlockSGDSolver

bu = int(sys.argv[1]); panel = int(sys.argv[2])
bi = int(sys.argv[3]) if len(sys.argv) > 3 else None
print("devices:", jax.devices(), "bu=", bu, "panel=", panel, flush=True)
n_users, n_items = 100_000, 20_000
from matfac_tpu.utils import freq
mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                             seed=0, noise=0.1, power_law=0.6, nonneg=True)
mat.values[:] = (np.clip(np.round(mat.values / 0.5), 1, 10) * 0.5).astype(np.float32)
iu, ii = freq.invalid_users_items(mat, n_users, n_items)
params = Params(fac_dim=64, u_reg=0.001, i_reg=0.001, learn_rate=0.005, seed=0)
model = ModelMF(params, n_users, n_items)
s = BlockSGDSolver(model, params, mat, iu, ii, collision_norm=True,
                   engine="dense", bu=bu, bi=bi,
                   dense_kernel="pallas_codes", dense_panel=panel)
print("staged", flush=True)
st = init_state(params, n_users, n_items)
key = jax.random.PRNGKey(0)
t0 = time.time()
key, k1 = jax.random.split(key)
st = s.epoch(st, 0.005, k1)
print("first epoch dispatched", f"{time.time()-t0:.1f}s", flush=True)
float(jnp.sum(st.u_fac[0]))
print("COMPILED+RAN", f"{time.time()-t0:.1f}s", flush=True)
key, k1 = jax.random.split(key)
st = s.epoch(st, 0.005, k1)
float(jnp.sum(st.u_fac[0]))
times = []
for _ in range(5):
    key, k1 = jax.random.split(key)
    t0 = time.time()
    st = s.epoch(st, 0.005, k1)
    float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))
    times.append(time.time() - t0)
dt = min(times)
print(f"PALLAS_CODES bu={bu} p={panel}: epoch={dt*1000:.1f}ms "
      f"rate={s.nnz/dt/1e6:.1f}M ({[round(t*1000,1) for t in times]})", flush=True)
