"""Microbench round 3: fused-launch variants of the limb-split matmul.

x2M:   h kept bf16 (exact round-trip), W in two bf16 limbs stacked along M:
       [Whi; Wlo] [1024,128] @ h [128,B], gates = top half + bottom half
       + fp32 VPU token columns. W error ~2^-18, h quantization ~2^-9.
x3cat: the three x3 passes as ONE matmul: [Whi | Whi | Wlo] [512,384] @
       [h_hi; h_lo; h_hi] [384,B] -- same MACs as 3 separate K=128 passes,
       one launch per direction per step.
Both use the VPU-select token contribution from kbench2 (no token matmul).
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
ref_arg = jnp.argmax(base_logits, 1)

OH = 8


def _kernel_v(
    tokens_ref, gather_ref,
    wM_f_ref, wM_b_ref,   # x2M: [1024,128]; x3cat: [512,384]
    tokw_f_ref, tokw_b_ref,  # [512, 8] f32
    out_ref,
    h_f, h_b, c_f, c_b, rhs_f, rhs_b,
    *, T, mode,
):
    tile_b = out_ref.shape[1]
    h_f[...] = jnp.zeros(h_f.shape, h_f.dtype)
    h_b[...] = jnp.zeros(h_b.shape, h_b.dtype)
    c_f[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    c_b[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    out_ref[...] = jnp.zeros((2 * HIDDEN, tile_b), jnp.float32)

    gather = gather_ref[...]

    def tokc(tokw_ref, tok_row):
        acc = jnp.broadcast_to(tokw_ref[:, pl.ds(4, 1)], (GATES, tile_b))
        for k in range(4):
            col = jnp.broadcast_to(tokw_ref[:, pl.ds(k, 1)], (GATES, tile_b))
            acc = jnp.where(tok_row == k, col, acc)
        return acc

    def cell(wM_ref, tokw_ref, h_ref, c_ref, rhs, tok_row):
        if mode == "x2M":
            mm = jnp.dot(
                wM_ref[...], h_ref[...], preferred_element_type=jnp.float32
            )  # [1024, B]
            gates = mm[0:GATES, :] + mm[GATES:, :] + tokc(tokw_ref, tok_row)
        else:  # x3cat
            h = h_ref[...]
            h_hi = h.astype(jnp.bfloat16)
            h_lo = (h - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rhs[0:HIDDEN, :] = h_hi
            rhs[HIDDEN : 2 * HIDDEN, :] = h_lo
            rhs[2 * HIDDEN : 3 * HIDDEN, :] = h_hi
            gates = jnp.dot(
                wM_ref[...], rhs[...], preferred_element_type=jnp.float32
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
        h_f_new, c_f_new = cell(wM_f_ref, tokw_f_ref, h_f, c_f, rhs_f, tok_f)
        h_b_new, c_b_new = cell(wM_b_ref, tokw_b_ref, h_b, c_b, rhs_b, tok_b)
        c_f[...] = c_f_new
        c_b[...] = c_b_new
        h_f[...] = h_f_new.astype(h_f.dtype)
        h_b[...] = h_b_new.astype(h_b.dtype)
        out_ref[0:HIDDEN, :] = jnp.where(
            gather == t, h_f_new, out_ref[0:HIDDEN, :]
        )
        out_ref[HIDDEN:, :] = jnp.where(
            gather == pos_b, h_b_new, out_ref[HIDDEN:, :]
        )
        return 0

    jax.lax.fori_loop(0, T, step, 0)


@functools.partial(jax.jit, static_argnames=("tile", "mode"))
def variant(params, tokens, tile=1024, mode="x2M"):
    Bx, Tx = tokens.shape
    tokens = tokens.astype(jnp.int32)
    gather = dense_gather_index(tokens)

    def prep(w_ih, w_hh, b):
        whh = w_hh.T.astype(jnp.float32)  # [512,128]
        whi = jax.lax.optimization_barrier(whh.astype(jnp.bfloat16))
        wlo = (whh - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        if mode == "x2M":
            wM = jnp.concatenate([whi, wlo], axis=0)  # [1024, 128]
        else:
            wM = jnp.concatenate([whi, whi, wlo], axis=1)  # [512, 384]
        tokw = jnp.concatenate(
            [w_ih + b[None, :], b[None, :], jnp.zeros((OH - 5, GATES))], axis=0
        ).astype(jnp.float32)
        return wM, tokw.T.copy()

    wM_f, tokw_f = prep(params.w_ih_f, params.w_hh_f, params.b_f)
    wM_b, tokw_b = prep(params.w_ih_b, params.w_hh_b, params.b_b)
    wshape = wM_f.shape
    h_dt = jnp.bfloat16 if mode == "x2M" else jnp.float32
    rhs_k = 3 * HIDDEN if mode == "x3cat" else 8  # dummy min for x2M

    grid = (Bx // tile,)
    kernel = functools.partial(_kernel_v, T=Tx, mode=mode)
    last_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tx, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(wshape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wshape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, OH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, OH), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * HIDDEN, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * HIDDEN, Bx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HIDDEN, tile), h_dt),
            pltpu.VMEM((HIDDEN, tile), h_dt),
            pltpu.VMEM((HIDDEN, tile), jnp.float32),
            pltpu.VMEM((HIDDEN, tile), jnp.float32),
            pltpu.VMEM((rhs_k, tile), jnp.bfloat16),
            pltpu.VMEM((rhs_k, tile), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * 2 * Bx * Tx * GATES * HIDDEN,
            bytes_accessed=Bx * Tx * 4,
            transcendentals=2 * Bx * Tx * GATES,
        ),
    )(
        tokens.T, gather.reshape(1, Bx),
        wM_f, wM_b, tokw_f, tokw_b,
    )
    logits = (
        jnp.dot(last_out.T, params.w_out.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + params.b_out
    )
    return logits


for mode in ("x2M", "x3cat"):
    for tile in (1024, 512):
        try:
            f = functools.partial(variant, tile=tile, mode=mode)
            dt, lg = timeit(f, params, tokens)
            flips = int((jnp.argmax(lg, 1) != ref_arg).sum())
            print(
                f"{mode} tile={tile}: {dt*1e3:8.2f} ms  {B/dt/1e6:6.2f} M reads/s"
                f"  flips vs x3: {flips}",
                flush=True,
            )
        except Exception as e:
            print(
                f"{mode} tile={tile}: FAILED {type(e).__name__}: {str(e)[:160]}",
                flush=True,
            )
