"""ML-20M single-chip code-tile probe (k argv): 272.7M/267.9M ratings/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_ml20m_codes_probe.py
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.solvers.block_sgd import BlockSGDSolver
from matfac_tpu.utils import freq
k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
print("devices:", jax.devices(), flush=True)
n_users, n_items = 138_000, 27_000
mat, _, _ = low_rank_ratings(n_users, n_items, k=8,
                             density=20e6 / (n_users * n_items),
                             seed=0, noise=0.1, power_law=0.6, nonneg=True)
mat.values[:] = (np.clip(np.round(mat.values / 0.5), 1, 10) * 0.5).astype(np.float32)
iu, ii = freq.invalid_users_items(mat, n_users, n_items)
print(f"nnz={mat.nnz}", flush=True)
params = Params(fac_dim=k, u_reg=0.001, i_reg=0.001, learn_rate=0.005, seed=0)
model = ModelMF(params, n_users, n_items)
t0 = time.time()
s = BlockSGDSolver(model, params, mat, iu, ii, collision_norm=True,
                   engine="dense", bu=None, bi=None)
print(f"staged mode={'codes' if s.W_cells is None else 'float'} "
      f"NU={s.NU} bu={s.bu} ni_pad={s.n_items_pad} {time.time()-t0:.1f}s", flush=True)
# force staging readback so the scatter actually ran
print("R probe:", int(jnp.sum(s.R_cells[0].astype(jnp.int32))), flush=True)
st = init_state(params, n_users, n_items)
key = jax.random.PRNGKey(0)
t0 = time.time()
for i in range(2):
    key, k1 = jax.random.split(key)
    st = s.epoch(st, 0.005, k1)
    print(f"warm epoch {i} dispatched {time.time()-t0:.1f}s", flush=True)
print("warm sync", float(jnp.sum(st.u_fac[0])), f"{time.time()-t0:.1f}s", flush=True)
times = []
for _ in range(4):
    key, k1 = jax.random.split(key)
    t0 = time.time()
    st = s.epoch(st, 0.005, k1)
    float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))
    times.append(time.time() - t0)
dt = min(times)
print(f"ML20M k={k} codes: epoch={dt*1000:.1f}ms rate={s.nnz/dt/1e6:.1f}M "
      f"(epochs {[round(t*1000,1) for t in times]})", flush=True)
