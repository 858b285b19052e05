"""Ablate the pallas_codes per-step cost: grid+stream floor, +P matmul,
+E elementwise, +item update, full. Each variant times 3 epochs of the
same (40, 157) grid at bu=2560, p=128, k=64."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NU, bu, panel, k = 40, 2560, 128, 64
ni = 157 * panel
NP0 = 157
print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
R = jnp.asarray(rng.integers(0, 3, (NU, NP0, bu, panel)).astype(np.int8))
U3 = jnp.asarray(rng.normal(size=(NU, bu, k)).astype(np.float32) * 0.1)
IT = jnp.asarray(rng.normal(size=(ni, k)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
row_of = jnp.arange(NU, dtype=jnp.int32)
NP = ni // panel


def make(variant):
    def kernel(ro_ref, u_in, r_in, i_in, u_out, i_out, acc, cnt):
        t = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((t == 0) & (j == 0))
        def _():
            i_out[:, :] = i_in[:, :]

        @pl.when(j == 0)
        def _():
            acc[:, :] = jnp.zeros_like(acc)
            cnt[:, :] = jnp.zeros_like(cnt)

        code = r_in[0, 0]
        if variant == "stream":
            acc[0:1, :] += jnp.full((1, k), jnp.sum(code.astype(jnp.float32)))
        else:
            U = u_in[0]
            Ub = U.astype(jnp.bfloat16)
            I = i_out[pl.ds(j * panel, panel), :]
            P = jax.lax.dot_general(Ub, I, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if variant == "pmm":
                acc[0:1, :] += jnp.full((1, k), jnp.sum(P))
            else:
                vm = (code != 0).astype(jnp.float32)
                E = vm * (code.astype(jnp.float32) * 0.5 - P)
                Em = E.astype(jnp.bfloat16)
                if variant == "elem":
                    acc[0:1, :] += jnp.full((1, k), jnp.sum(Em.astype(jnp.float32)))
                else:
                    cnt_i = jnp.sum(vm, axis=0)[:, None]
                    If = I.astype(jnp.float32)
                    gi = (-2.0 * jax.lax.dot_general(
                        Em, Ub, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                        + 0.002 * cnt_i * If)
                    i_out[pl.ds(j * panel, panel), :] = (
                        If - 0.005 * gi).astype(jnp.bfloat16)
                    if variant == "item":
                        acc[0:1, :] += jnp.zeros((1, k))
                    else:  # full
                        acc[:, :] += jax.lax.dot_general(
                            Em, I, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        cnt[:, :] += jnp.sum(vm, axis=1, keepdims=True)

                        @pl.when(j == NP - 1)
                        def _():
                            u_out[0] = U - 0.005 * (
                                -2.0 * acc[:, :] + 0.002 * cnt[:, :] * U)

        if variant != "full":
            @pl.when(j == NP - 1)
            def _():
                u_out[0] = u_in[0]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NU, NP),
        in_specs=[pl.BlockSpec((1, bu, k), lambda t, j, ro: (ro[t], 0, 0)),
                  pl.BlockSpec((1, 1, bu, panel), lambda t, j, ro: (ro[t], j, 0, 0)),
                  pl.BlockSpec((ni, k), lambda t, j, ro: (0, 0))],
        out_specs=[pl.BlockSpec((1, bu, k), lambda t, j, ro: (ro[t], 0, 0)),
                   pl.BlockSpec((ni, k), lambda t, j, ro: (0, 0))],
        scratch_shapes=[pltpu.VMEM((bu, k), jnp.float32),
                        pltpu.VMEM((bu, 1), jnp.float32)])

    @jax.jit
    def run(u3, it, r):
        return pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((NU, bu, k), jnp.float32),
                       jax.ShapeDtypeStruct((ni, k), jnp.bfloat16)],
        )(row_of, u3, r, it)
    return run


for variant in ("stream", "pmm", "elem", "item", "full"):
    try:
        run = make(variant)
        u, i = run(U3, IT, R)
        float(jnp.sum(u[0, 0]))
        times = []
        for _ in range(3):
            t0 = time.time()
            u, i = run(U3, IT, R)
            float(jnp.sum(u[0, 0]) + jnp.sum(i[0]))
            times.append(time.time() - t0)
        print(f"{variant}: {min(times)*1000:.1f} ms "
              f"({[round(t*1000,1) for t in times]})", flush=True)
    except Exception as e:
        print(f"{variant} FAIL: {type(e).__name__} {str(e)[:150]}",
              flush=True)
