"""Device mesh construction + factor-table sharding specs.

The reference's only parallelism is single-node OpenMP shared memory
(SURVEY.md §2 "Parallelism status"); there is nothing to port. This
module is the from-scratch TPU scaling layer: a 1-2D
``jax.sharding.Mesh`` whose axes shard the *embedding-table heights*
(n_users / n_items) — the scale axes of this workload (SURVEY.md §5
"long-context" note). PP/TP-for-matmuls/SP/EP do not apply to MF; the
distributed decomposition is

  * "u" axis — row-shards uFac (the DP-like axis: rating batches are
    partitioned by user block so user rows stay local), and
  * "i" axis — row-shards iFac (the MP-like axis: item rows are fetched
    / reduced via collectives XLA inserts, or explicitly rotated by the
    DSGD solver in parallel.dsgd).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matfac_tpu.models.base import MFState


def make_mesh(shape: Optional[Sequence[int]] = None,
              axes: Sequence[str] = ("u", "i"),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None or len(shape) == 0:
        # default: all devices on the user axis
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes[: len(shape)]))


def factor_sharding(mesh: Mesh, u_axis: str = "u", i_axis: str = "i"
                    ) -> Tuple[NamedSharding, NamedSharding]:
    """Row-sharding specs for (uFac, iFac)."""
    u_spec = P(u_axis if u_axis in mesh.axis_names else None, None)
    i_spec = P(i_axis if i_axis in mesh.axis_names else None, None)
    return NamedSharding(mesh, u_spec), NamedSharding(mesh, i_spec)


def shard_state(state: MFState, mesh: Mesh, u_axis: str = "u",
                i_axis: str = "i") -> MFState:
    """Place a model state onto the mesh: factors row-sharded, biases
    sharded along the same axes, mu replicated."""
    u_sh, i_sh = factor_sharding(mesh, u_axis, i_axis)
    ub_sh = NamedSharding(mesh, P(u_axis if u_axis in mesh.axis_names
                                  else None))
    ib_sh = NamedSharding(mesh, P(i_axis if i_axis in mesh.axis_names
                                  else None))
    rep = NamedSharding(mesh, P())
    return MFState(
        u_fac=jax.device_put(state.u_fac, u_sh),
        i_fac=jax.device_put(state.i_fac, i_sh),
        u_bias=jax.device_put(state.u_bias, ub_sh),
        i_bias=jax.device_put(state.i_bias, ib_sh),
        mu=jax.device_put(state.mu, rep),
    )


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
