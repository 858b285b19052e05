"""Sharded-eval perf row (VERDICT r4 #8): 1M x 100k on ONE chip, eval
through the mesh-sharded paths (1-device mesh = the sharded code path
at single-chip rate) + the plain paths for comparison."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import Mesh
from matfac_tpu.config import Params
from matfac_tpu.data.csr import RatingMatrix
from matfac_tpu.data.dataset import Data
from matfac_tpu.data.synthetic import low_rank_ratings
from matfac_tpu.eval.metrics import Evaluator
from matfac_tpu.eval.ranking import CatalogScorer
from matfac_tpu.models.base import ModelMF, init_state
from matfac_tpu.utils import freq
print("devices:", jax.devices(), flush=True)
n_users, n_items = 1_000_000, 100_000
t0 = time.time()
mat, _, _ = low_rank_ratings(n_users, n_items, k=8, density=1e-3,
                             seed=0, noise=0.1, power_law=0.6, nonneg=True)
print(f"gen {time.time()-t0:.0f}s nnz={mat.nnz}", flush=True)
iu, ii = freq.invalid_users_items(mat, n_users, n_items)
params = Params(fac_dim=64, u_reg=0.01, i_reg=0.01, seed=0)
model = ModelMF(params, n_users, n_items)
state = init_state(params, n_users, n_items)
view = model.eval_view(state)
mesh = Mesh(np.asarray(jax.devices()[:1]), ("u",))
data = Data(train_mat=mat)

for tag, ev in [("plain", Evaluator(data, iu, ii, params)),
                ("mesh(1)", Evaluator(data, iu, ii, params, mesh=mesh))]:
    t0 = time.time()
    r = ev.rmse(view, "train")
    warm = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = ev.rmse(view, "train")
        ts.append(time.time() - t0)
    print(f"RMSE {tag}: {r:.4f} warm={warm:.1f}s steady={min(ts)*1000:.0f}ms "
          f"({mat.nnz/min(ts)/1e6:.0f}M ratings/s)", flush=True)
    del ev

rng = np.random.default_rng(1)
loo = RatingMatrix.from_coo(
    np.arange(n_users, dtype=np.int64),
    rng.integers(0, n_items, n_users),
    np.ones(n_users, np.float32), n_users, n_items)
for tag, sc in [("plain", CatalogScorer(mat, iu, ii, n_users, n_items)),
                ("mesh(1)", CatalogScorer(mat, iu, ii, n_users, n_items,
                                          mesh=mesh))]:
    t0 = time.time()
    hr = sc.hit_rate(view, loo, 10)
    warm = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time()
        hr = sc.hit_rate(view, loo, 10)
        ts.append(time.time() - t0)
    print(f"HR@10 {tag}: {hr:.4f} warm={warm:.1f}s steady={min(ts):.2f}s "
          f"({n_users*n_items/min(ts)/1e9:.0f}G pairs/s)", flush=True)
    del sc
