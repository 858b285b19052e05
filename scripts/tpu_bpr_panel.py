"""Dense BPR panel mode on hardware: full shape, bench-protocol-ish
(3 epochs per readback), vs base dense and stream engines."""
import time
import numpy as np
import jax, jax.numpy as jnp
from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.models.base import init_state
from matfac_tpu.models.bpr import ModelMFBPR
from matfac_tpu.solvers.bpr import BPRSolver
from matfac_tpu.solvers.bpr_dense import DenseBPRSolver
from matfac_tpu.utils import freq
print("devices:", jax.devices(), flush=True)
n_users, n_items = 100_000, 20_000
mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                             seed=0, noise=0.1, power_law=0.6, nonneg=True)
iu, ii = freq.invalid_users_items(mat, n_users, n_items)
params = Params(fac_dim=64, u_reg=0.01, i_reg=0.01, seed=0)
model = ModelMFBPR(params, n_users, n_items)

def bench(tag, s, pairs_per_pos=1, n=3, reps=3):
    st = init_state(params, n_users, n_items)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, k1 = jax.random.split(key)
        st = s.epoch(st, 0.01, k1)
    float(jnp.sum(st.u_fac[0]))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n):
            key, k1 = jax.random.split(key)
            st = s.epoch(st, 0.01, k1)
        float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))
        best = min(best, (time.time() - t0) / n)
    print(f"{tag}: epoch={best*1000:.1f}ms positives/s="
          f"{s.n_pos/best/1e6:.1f}M pairs/s="
          f"{s.n_pos*pairs_per_pos/best/1e6:.1f}M", flush=True)
    del st

sb = BPRSolver(model, params, mat, iu, ii, n_tries=2, sampler="rankgap")
bench("stream-rankgap(bench cfg)", sb, n=2, reps=2)
del sb
sd = DenseBPRSolver(model, params, mat, iu, ii)
bench("dense n_negs=1", sd)
del sd
for Q in (8, 32, 128):
    sp = DenseBPRSolver(model, params, mat, iu, ii, panel_q=Q)
    bench(f"panel Q={Q}", sp, pairs_per_pos=Q)
    del sp
