"""Dense ALS: config sweep (blk, cg_iters) + phase decomposition at
the full bench shape; bench protocol (3 epochs/readback)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from matfac_tpu.config import Params
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.solvers.als import DenseALSSolver
from matfac_tpu.utils import freq
print("devices:", jax.devices(), flush=True)
n_users, n_items = 100_000, 20_000
mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=0.005,
                             seed=0, noise=0.1, power_law=0.6, nonneg=True)
iu, ii = freq.invalid_users_items(mat, n_users, n_items)
params = Params(fac_dim=64, u_reg=0.01, i_reg=0.01, seed=0)
model = ModelMF(params, n_users, n_items)

def bench(tag, mk, n=3, reps=3):
    try:
        s = mk()
    except Exception as e:
        print(f"{tag} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    st = init_state(params, n_users, n_items)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, k1 = jax.random.split(key)
        st = s.epoch(st, 0.0, k1)
    float(jnp.sum(st.u_fac[0]))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n):
            key, k1 = jax.random.split(key)
            st = s.epoch(st, 0.0, k1)
        float(jnp.sum(st.u_fac[0]) + jnp.sum(st.i_fac[0]))
        best = min(best, (time.time() - t0) / n)
    print(f"{tag}: epoch={best*1000:.1f}ms rate={mat.nnz/best/1e6:.1f}M",
          flush=True)
    del s, st

for blk in (2048, 8192):
    for cg in (6, 4, 3):
        bench(f"int8 blk={blk} cg={cg}",
              lambda blk=blk, cg=cg: DenseALSSolver(
                  model, params, mat, iu, ii, row_block=blk,
                  cg_iters=cg, gram_int8=True))
bench("int8 blk=16384 cg=6",
      lambda: DenseALSSolver(model, params, mat, iu, ii,
                             row_block=16384, cg_iters=6,
                             gram_int8=True))
