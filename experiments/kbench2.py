"""Microbench round 2: K=128 matmuls + VPU-select token contribution.

Variant "vpusel": the fused [512,136] matmul (K pads to 2 MXU k-tiles = 256)
is replaced by a pure recurrent [512,128] matmul (exactly 1 k-tile) and the
token/bias contribution is added with a 5-way masked select on the VPU from
a [512, 8] per-token column table -- no small matmul (kbench.py showed the
[512,8]@[8,B] tokc matmul makes things SLOWER: a K=8 matmul still costs a
full pass plus launch latency).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from ribodetector_tpu.models import load_params
from ribodetector_tpu.ops.lstm_pallas import bilstm_logits_pallas
from ribodetector_tpu.models.bilstm import GATES, HIDDEN, dense_gather_index

B, T = 131072, 100
rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(0, 5, (B, T)).astype(np.uint8))
params = load_params("/root/repo/ribodetector_tpu/data/ribodetector_v1.npz")


def timeit(fn, *args, n=8):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    pending = None
    for _ in range(n):
        o = fn(*args)
        if pending is not None:
            np.asarray(pending)
        pending = o
    np.asarray(pending)
    dt = (time.perf_counter() - t0) / n
    return dt, out


f_x3 = functools.partial(bilstm_logits_pallas, semantics="dense", matmul="x3")
dt, base_logits = timeit(f_x3, params, tokens)
print(f"baseline x3:  {dt*1e3:8.2f} ms  {B/dt/1e6:6.2f} M reads/s", flush=True)
f_x1 = functools.partial(bilstm_logits_pallas, semantics="dense", matmul="x1")
dt, _ = timeit(f_x1, params, tokens)
print(f"baseline x1:  {dt*1e3:8.2f} ms  {B/dt/1e6:6.2f} M reads/s", flush=True)

OH = 8


def _kernel_v(
    tokens_ref, gather_ref,
    whi_f_ref, whi_b_ref, wlo_f_ref, wlo_b_ref,
    tokw_f_ref,  # [GATES, 8] f32: per-token gate columns (incl bias)
    tokw_b_ref,
    out_ref,
    h_f, h_b, c_f, c_b,
    *, T, unroll, nsel, mode,
):
    tile_b = out_ref.shape[1]
    h_f[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    h_b[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    c_f[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    c_b[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    out_ref[...] = jnp.zeros((2 * HIDDEN, tile_b), jnp.float32)

    gather = gather_ref[...]

    def tokc(tokw_ref, tok_row):
        # [512, B] token contribution via masked selects (VPU only)
        acc = jnp.broadcast_to(tokw_ref[:, pl.ds(4, 1)], (GATES, tile_b))
        for k in range(nsel):
            col = jnp.broadcast_to(tokw_ref[:, pl.ds(k, 1)], (GATES, tile_b))
            acc = jnp.where(tok_row == k, col, acc)
        return acc

    def cell(whi_ref, wlo_ref, tokw_ref, h_ref, c_ref, tok_row):
        h = h_ref[...]
        h_hi = h.astype(jnp.bfloat16)
        whi = whi_ref[...]
        if mode == "x3":
            h_lo = (h - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            gates = (
                jnp.dot(whi, h_hi, preferred_element_type=jnp.float32)
                + jnp.dot(whi, h_lo, preferred_element_type=jnp.float32)
                + jnp.dot(wlo_ref[...], h_hi, preferred_element_type=jnp.float32)
                + tokc(tokw_ref, tok_row)
            )
        else:  # x1-ish: one bf16 pass, fp32 token add
            gates = jnp.dot(
                whi, h_hi, preferred_element_type=jnp.float32
            ) + tokc(tokw_ref, tok_row)
        sig = jax.nn.sigmoid
        i = sig(gates[0:HIDDEN, :])
        f = sig(gates[HIDDEN : 2 * HIDDEN, :])
        g = jnp.tanh(gates[2 * HIDDEN : 3 * HIDDEN, :])
        o = sig(gates[3 * HIDDEN : 4 * HIDDEN, :])
        c_new = f * c_ref[...] + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    def step(t, _):
        pos_b = T - 1 - t
        tok_f = tokens_ref[pl.ds(t, 1), :]
        tok_b = tokens_ref[pl.ds(pos_b, 1), :]
        h_f_new, c_f_new = cell(whi_f_ref, wlo_f_ref, tokw_f_ref, h_f, c_f, tok_f)
        h_b_new, c_b_new = cell(whi_b_ref, wlo_b_ref, tokw_b_ref, h_b, c_b, tok_b)
        c_f[...] = c_f_new
        c_b[...] = c_b_new
        h_f[...] = h_f_new
        h_b[...] = h_b_new
        out_ref[0:HIDDEN, :] = jnp.where(
            gather == t, h_f_new, out_ref[0:HIDDEN, :]
        )
        out_ref[HIDDEN:, :] = jnp.where(
            gather == pos_b, h_b_new, out_ref[HIDDEN:, :]
        )
        return 0

    jax.lax.fori_loop(0, T, step, 0, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("tile", "unroll", "nsel", "mode"))
def variant(params, tokens, tile=1024, unroll=1, nsel=4, mode="x3"):
    Bx, Tx = tokens.shape
    tokens = tokens.astype(jnp.int32)
    gather = dense_gather_index(tokens)

    def prep(w_ih, w_hh, b):
        whh = w_hh.T.astype(jnp.float32)  # [512,128]
        whi = jax.lax.optimization_barrier(whh.astype(jnp.bfloat16))
        wlo = (whh - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        tokw = jnp.concatenate(
            [w_ih + b[None, :], b[None, :], jnp.zeros((OH - 5, GATES))], axis=0
        ).astype(jnp.float32)  # [8, 512]
        return whi, wlo, tokw.T.copy()  # tokw -> [512, 8]

    whi_f, wlo_f, tokw_f = prep(params.w_ih_f, params.w_hh_f, params.b_f)
    whi_b, wlo_b, tokw_b = prep(params.w_ih_b, params.w_hh_b, params.b_b)

    grid = (Bx // tile,)
    kernel = functools.partial(_kernel_v, T=Tx, unroll=unroll, nsel=nsel, mode=mode)
    last_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tx, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, HIDDEN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, HIDDEN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, HIDDEN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, HIDDEN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, OH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, OH), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * HIDDEN, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * HIDDEN, Bx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HIDDEN, tile), jnp.float32),
            pltpu.VMEM((HIDDEN, tile), jnp.float32),
            pltpu.VMEM((HIDDEN, tile), jnp.float32),
            pltpu.VMEM((HIDDEN, tile), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * 2 * Bx * Tx * GATES * HIDDEN,
            bytes_accessed=Bx * Tx * 4,
            transcendentals=2 * Bx * Tx * GATES,
        ),
    )(
        tokens.T, gather.reshape(1, Bx),
        whi_f, whi_b, wlo_f, wlo_b, tokw_f, tokw_b,
    )
    logits = (
        jnp.dot(last_out.T, params.w_out.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + params.b_out
    )
    return logits


ref_arg = jnp.argmax(base_logits, 1)
for mode in ("x3", "x1"):
    for tile, unroll in ((1024, 1), (1024, 2), (2048, 1), (512, 1)):
        try:
            f = functools.partial(variant, tile=tile, unroll=unroll, mode=mode)
            dt, lg = timeit(f, params, tokens)
            flips = int((jnp.argmax(lg, 1) != ref_arg).sum())
            print(
                f"vpusel {mode} tile={tile} unroll={unroll}: {dt*1e3:8.2f} ms "
                f" {B/dt/1e6:6.2f} M reads/s  flips vs x3: {flips}",
                flush=True,
            )
        except Exception as e:
            print(
                f"vpusel {mode} tile={tile} unroll={unroll}: FAILED "
                f"{type(e).__name__}: {str(e)[:160]}",
                flush=True,
            )
