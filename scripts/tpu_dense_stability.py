"""Steady-state stability probe for the row-dense engine: after a
2-epoch warmup the epoch time is flat (measured 24.4 +/- 0.1 ms over
12 epochs at the full bench shape) — the bench swing was the second
(donated-input) program compile landing inside a 1-epoch-warmup timed
window (bench.py time_epochs comment).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  scripts/tpu_dense_stability.py > /tmp/tpu_dense_stability.log 2>&1 &
"""

import time
import jax, jax.numpy as jnp
from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.solvers.block_sgd import BlockSGDSolver
from matfac_tpu.utils import freq
print("devices:", jax.devices(), flush=True)
mat, _, _ = low_rank_ratings(100_000, 20_000, k=8, density=0.005,
                             seed=0, noise=0.1, power_law=0.6, nonneg=True)
iu, ii = freq.invalid_users_items(mat, 100_000, 20_000)
p = Params(fac_dim=64, u_reg=0.01, i_reg=0.01, learn_rate=0.005, seed=0)
m = ModelMF(p, 100_000, 20_000)
s = BlockSGDSolver(m, p, mat, iu, ii, collision_norm=True,
                   engine="dense", bu=None, bi=None)
st = init_state(p, 100_000, 20_000)
key = jax.random.PRNGKey(0)
key, k1 = jax.random.split(key)
st = s.epoch(st, 0.005, k1)
float(jnp.sum(st.u_fac[0]))
for burst in range(4):
    t0 = time.perf_counter()
    for _ in range(3):
        key, k1 = jax.random.split(key)
        st = s.epoch(st, 0.005, k1)
    float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))
    dt = (time.perf_counter() - t0) / 3
    print(f"burst {burst}: {dt*1000:.1f} ms/epoch", flush=True)
