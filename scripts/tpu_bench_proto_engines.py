"""EXACT bench.py protocol (2-epoch warmup, 3 timed epochs, one force
readback): float-xla (headline protocol), codes-xla, codes-pallas,
scatter ref. One process."""
import time
import numpy as np
import jax, jax.numpy as jnp
from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.solvers.block_sgd import BlockSGDSolver
from matfac_tpu.solvers.sgd import SGDSolver
from matfac_tpu.utils import freq
print("devices:", jax.devices(), flush=True)
n_users, n_items = 100_000, 20_000
mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                             seed=0, noise=0.1, power_law=0.6, nonneg=True)
iu, ii = freq.invalid_users_items(mat, n_users, n_items)
smat = mat.copy()
smat.values[:] = (np.clip(np.round(smat.values / 0.5), 1, 10) * 0.5).astype(np.float32)
params = Params(fac_dim=64, u_reg=0.01, i_reg=0.01, learn_rate=0.005,
                seed=0, batch_size=65536)
model = ModelMF(params, n_users, n_items)

def force(state):
    return float(jnp.sum(state.u_fac[0]) + jnp.sum(state.i_fac[0]))

def time_epochs(solver, n=3, reps=3):
    best = 1e9
    state = init_state(params, n_users, n_items)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, k1 = jax.random.split(key)
        state = solver.epoch(state, params.learn_rate, k1)
    force(state)
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            key, k1 = jax.random.split(key)
            state = solver.epoch(state, params.learn_rate, k1)
        force(state)
        best = min(best, (time.perf_counter() - t0) / n)
    return best

s = SGDSolver(model, params, mat, iu, ii)
dt = time_epochs(s, n=2, reps=2)
print(f"scatter-ref: {dt*1000:.1f}ms {s.nnz/dt/1e6:.1f}M", flush=True)
del s
s = BlockSGDSolver(model, params, mat, iu, ii, collision_norm=True,
                   engine="dense", bu=None, bi=None)  # continuous -> float
dt = time_epochs(s)
print(f"float-xla (headline proto): {dt*1000:.1f}ms {s.nnz/dt/1e6:.1f}M", flush=True)
del s
s = BlockSGDSolver(model, params, smat, iu, ii, collision_norm=True,
                   engine="dense", bu=None, bi=None, dense_codes="auto")
dt = time_epochs(s)
print(f"codes-xla: {dt*1000:.1f}ms {s.nnz/dt/1e6:.1f}M", flush=True)
del s
s = BlockSGDSolver(model, params, smat, iu, ii, collision_norm=True,
                   engine="dense", bu=2560, bi=None,
                   dense_kernel="pallas_codes", dense_panel=128)
dt = time_epochs(s)
print(f"codes-pallas: {dt*1000:.1f}ms {s.nnz/dt/1e6:.1f}M", flush=True)
