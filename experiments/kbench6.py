"""Microbench round 6: push past tsig (tanh-form sigmoid, 1.95 M reads/s).

kbench5 findings on the real chip (B=131072, T=100, tile=1024):
  prod x3 (sigmoid, VPU tokc):        93.9 ms   1.40 M reads/s
  fold3 (token cols in matmul K=408): 81.3 ms   1.61 M reads/s  <- MXU-latency floor
  tsig  (sigmoid as 0.5*tanh(.5x)+.5):67.1 ms   1.95 M reads/s  <- VPU still critical
Variants here, all on top of tsig:
  smalldot: tokc replaced by a SEPARATE [512,24]@[24,B] 3-limb token matmul
            (K pads to one 128-tile; independent of h so it can issue early)
  ifo:      gate rows permuted [i;f;o;g] -> one tanh slab [384,B] + tanh g
  tile:     1024 vs 2048 vs 512 sweep for the winner
  unroll2:  two time steps per fori_loop iteration
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

INTERPRET = bool(os.environ.get("KB_INTERPRET"))

from ribodetector_tpu.models import load_params
from ribodetector_tpu.models.bilstm import GATES, HIDDEN, bilstm_logits, dense_gather_index

B, T = 131072, 100
OH = 8
K3 = 3 * HIDDEN  # 384
KTOK = 3 * OH    # 24: three bf16 limbs of the [512,8] token/bias table


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


def _kernel_v(
    tokens_ref, gather_ref,
    wM_f_ref, wM_b_ref,        # [512, 384] bf16
    tokw_f_ref, tokw_b_ref,    # smalldot: [512, 24] bf16 limbs; else [512, 8] f32
    out_ref,
    h_f, h_b, c_f, c_b, rhs_f, rhs_b, oh_s,
    *, T, smalldot, ifo, unroll,
):
    tile_b = out_ref.shape[1]
    h_f[...] = jnp.zeros(h_f.shape, jnp.float32)
    h_b[...] = jnp.zeros(h_b.shape, jnp.float32)
    c_f[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    c_b[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    out_ref[...] = jnp.zeros((2 * HIDDEN, tile_b), jnp.float32)

    gather = gather_ref[...]
    row_iota8 = jax.lax.broadcasted_iota(jnp.int32, (OH, tile_b), 0)

    def sig(x):
        return 0.5 * jnp.tanh(0.5 * x) + 0.5

    def tok_contrib(tokw_ref, tok_row):
        if smalldot:
            oh = (row_iota8 == tok_row).astype(jnp.bfloat16)  # [8, B]
            oh_s[0:OH, :] = oh
            oh_s[OH : 2 * OH, :] = oh
            oh_s[2 * OH :, :] = oh
            return jnp.dot(
                tokw_ref[...], oh_s[...], preferred_element_type=jnp.float32
            )
        acc = jnp.broadcast_to(tokw_ref[:, pl.ds(4, 1)], (GATES, tile_b))
        for k in range(4):
            col = jnp.broadcast_to(tokw_ref[:, pl.ds(k, 1)], (GATES, tile_b))
            acc = jnp.where(tok_row == k, col, acc)
        return acc

    def cell(wM_ref, tokw_ref, h, c, rhs, tok_row):
        h_hi = h.astype(jnp.bfloat16)
        h_lo = (h - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rhs[0:HIDDEN, :] = h_hi
        rhs[HIDDEN : 2 * HIDDEN, :] = h_lo
        rhs[2 * HIDDEN : 3 * HIDDEN, :] = h_hi
        gates = jnp.dot(
            wM_ref[...], rhs[...], preferred_element_type=jnp.float32
        ) + tok_contrib(tokw_ref, tok_row)
        if ifo:
            s = sig(gates[0 : 3 * HIDDEN, :])
            i = s[0:HIDDEN, :]
            f = s[HIDDEN : 2 * HIDDEN, :]
            o = s[2 * HIDDEN : 3 * HIDDEN, :]
            g = jnp.tanh(gates[3 * HIDDEN :, :])
        else:
            i = sig(gates[0:HIDDEN, :])
            f = sig(gates[HIDDEN : 2 * HIDDEN, :])
            g = jnp.tanh(gates[2 * HIDDEN : 3 * HIDDEN, :])
            o = sig(gates[3 * HIDDEN : 4 * HIDDEN, :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    def one(t, hf, hb, cf, cb):
        pos_b = T - 1 - t
        tok_f = tokens_ref[pl.ds(t, 1), :]
        tok_b = tokens_ref[pl.ds(pos_b, 1), :]
        hf2, cf2 = cell(wM_f_ref, tokw_f_ref, hf, cf, rhs_f, tok_f)
        hb2, cb2 = cell(wM_b_ref, tokw_b_ref, hb, cb, rhs_b, tok_b)
        out_ref[0:HIDDEN, :] = jnp.where(gather == t, hf2, out_ref[0:HIDDEN, :])
        out_ref[HIDDEN:, :] = jnp.where(gather == pos_b, hb2, out_ref[HIDDEN:, :])
        return hf2, hb2, cf2, cb2

    nu = max(1, unroll)

    def step(i, _):
        t = i * nu
        hf, hb, cf, cb = h_f[...], h_b[...], c_f[...], c_b[...]
        for j in range(nu):
            hf, hb, cf, cb = one(t + j, hf, hb, cf, cb)
        h_f[...] = hf
        h_b[...] = hb
        c_f[...] = cf
        c_b[...] = cb
        return 0

    jax.lax.fori_loop(0, T // nu, step, 0)
    for t in range((T // nu) * nu, T):
        hf, hb, cf, cb = one(t, h_f[...], h_b[...], c_f[...], c_b[...])
        h_f[...] = hf
        h_b[...] = hb
        c_f[...] = cf
        c_b[...] = cb


@functools.partial(jax.jit, static_argnames=("tile", "smalldot", "ifo", "unroll"))
def variant(params, tokens, tile=1024, smalldot=False, ifo=False, unroll=1):
    Bx, Tx = tokens.shape
    tokens = tokens.astype(jnp.int32)
    gather = dense_gather_index(tokens)

    if ifo:
        perm = jnp.concatenate([
            jnp.arange(0, 2 * HIDDEN),
            jnp.arange(3 * HIDDEN, 4 * HIDDEN),
            jnp.arange(2 * HIDDEN, 3 * HIDDEN),
        ])
    else:
        perm = jnp.arange(GATES)

    def prep(w_ih, w_hh, b):
        whh = w_hh.T.astype(jnp.float32)[perm]
        whi = jax.lax.optimization_barrier(whh.astype(jnp.bfloat16))
        wlo = (whh - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        wM = jnp.concatenate([whi, whi, wlo], axis=1)  # [512, 384]
        tokcols = jnp.concatenate(
            [w_ih + b[None, :], b[None, :], jnp.zeros((OH - 5, GATES))], axis=0
        ).astype(jnp.float32).T[perm]  # [512, 8]
        if smalldot:
            t1 = jax.lax.optimization_barrier(tokcols.astype(jnp.bfloat16))
            r1 = tokcols - t1.astype(jnp.float32)
            t2 = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
            t3 = (r1 - t2.astype(jnp.float32)).astype(jnp.bfloat16)
            tokw = jnp.concatenate([t1, t2, t3], axis=1)  # [512, 24] bf16
        else:
            tokw = tokcols
        return wM, tokw

    wM_f, tokw_f = prep(params.w_ih_f, params.w_hh_f, params.b_f)
    wM_b, tokw_b = prep(params.w_ih_b, params.w_hh_b, params.b_b)
    tokshape = tokw_f.shape

    grid = (Bx // tile,)
    kernel = functools.partial(
        _kernel_v, T=Tx, smalldot=smalldot, ifo=ifo, unroll=unroll
    )
    last_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tx, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, K3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GATES, K3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tokshape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tokshape, lambda i: (0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((K3, tile), jnp.bfloat16),
            pltpu.VMEM((K3, tile), jnp.bfloat16),
            pltpu.VMEM((KTOK, tile), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * 2 * Bx * Tx * GATES * HIDDEN,
            bytes_accessed=Bx * Tx * 4,
            transcendentals=2 * Bx * Tx * GATES,
        ),
        interpret=INTERPRET,
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


if __name__ == "__main__":
    params = load_params("/root/repo/ribodetector_tpu/data/ribodetector_v1.npz")
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 5, (B, T)).astype(np.uint8))
    refl = np.asarray(jax.jit(
        lambda t: bilstm_logits(params, t, semantics="dense"))(tokens))
    ref_arg = refl.argmax(1)
    margin = np.abs(refl[:, 1] - refl[:, 0])

    for tile, smalldot, ifo, unroll in [
        (1024, False, False, 1),   # = kbench5 tsig baseline
        (1024, True, False, 1),
        (1024, False, True, 1),
        (1024, True, True, 1),
        (2048, False, False, 1),
        (512, False, False, 1),
        (1024, False, False, 2),
    ]:
        name = f"tile={tile} smalldot={int(smalldot)} ifo={int(ifo)} unroll={unroll}"
        try:
            f = functools.partial(
                variant, tile=tile, smalldot=smalldot, ifo=ifo, unroll=unroll
            )
            dt, lg = timeit(f, params, tokens)
            fl = np.asarray(jnp.argmax(lg, 1)) != ref_arg
            flips = int(fl.sum())
            worst = float(margin[fl].max()) if flips else 0.0
            print(f"{name}: {dt*1e3:8.2f} ms  {B/dt/1e6:6.2f} M reads/s"
                  f"  flips {flips} (worst ref margin {worst:.2e})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


# ---- round 6b: appended variants (run: python kbench6.py b) ----
def _kernel_bd(
    tokens_ref, gather_ref,
    wBD_ref,        # [1024, 768] bf16 block-diag: [[Wf,0],[0,Wb]]
    tokw_f_ref, tokw_b_ref,    # [512, 8] f32
    out_ref,
    h_f, h_b, c_f, c_b, rhs,
    *, T,
):
    tile_b = out_ref.shape[1]
    h_f[...] = jnp.zeros(h_f.shape, jnp.float32)
    h_b[...] = jnp.zeros(h_b.shape, jnp.float32)
    c_f[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    c_b[...] = jnp.zeros((HIDDEN, tile_b), jnp.float32)
    out_ref[...] = jnp.zeros((2 * HIDDEN, tile_b), jnp.float32)
    gather = gather_ref[...]

    def sig(x):
        return 0.5 * jnp.tanh(0.5 * x) + 0.5

    def tokc(tokw_ref, tok_row):
        acc = jnp.broadcast_to(tokw_ref[:, pl.ds(4, 1)], (GATES, tile_b))
        for k in range(4):
            col = jnp.broadcast_to(tokw_ref[:, pl.ds(k, 1)], (GATES, tile_b))
            acc = jnp.where(tok_row == k, col, acc)
        return acc

    def act(gates, c):
        i = sig(gates[0:HIDDEN, :])
        f = sig(gates[HIDDEN : 2 * HIDDEN, :])
        g = jnp.tanh(gates[2 * HIDDEN : 3 * HIDDEN, :])
        o = sig(gates[3 * HIDDEN : 4 * HIDDEN, :])
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    def one(t, hf, hb, cf, cb):
        pos_b = T - 1 - t
        tok_f = tokens_ref[pl.ds(t, 1), :]
        tok_b = tokens_ref[pl.ds(pos_b, 1), :]
        for base, h in ((0, hf), (K3, hb)):
            h_hi = h.astype(jnp.bfloat16)
            h_lo = (h - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rhs[base : base + HIDDEN, :] = h_hi
            rhs[base + HIDDEN : base + 2 * HIDDEN, :] = h_lo
            rhs[base + 2 * HIDDEN : base + 3 * HIDDEN, :] = h_hi
        gg = jnp.dot(wBD_ref[...], rhs[...], preferred_element_type=jnp.float32)
        hf2, cf2 = act(gg[0:GATES, :] + tokc(tokw_f_ref, tok_f), cf)
        hb2, cb2 = act(gg[GATES:, :] + tokc(tokw_b_ref, tok_b), cb)
        out_ref[0:HIDDEN, :] = jnp.where(gather == t, hf2, out_ref[0:HIDDEN, :])
        out_ref[HIDDEN:, :] = jnp.where(gather == pos_b, hb2, out_ref[HIDDEN:, :])
        return hf2, hb2, cf2, cb2

    def step(i, _):
        t = i * 2
        hf, hb, cf, cb = one(t, h_f[...], h_b[...], c_f[...], c_b[...])
        hf, hb, cf, cb = one(t + 1, hf, hb, cf, cb)
        h_f[...] = hf
        h_b[...] = hb
        c_f[...] = cf
        c_b[...] = cb
        return 0

    jax.lax.fori_loop(0, T // 2, step, 0)
    for t in range((T // 2) * 2, T):
        hf, hb, cf, cb = one(t, h_f[...], h_b[...], c_f[...], c_b[...])
        h_f[...] = hf
        h_b[...] = hb
        c_f[...] = cf
        c_b[...] = cb


@functools.partial(jax.jit, static_argnames=("tile",))
def variant_bd(params, tokens, tile=1024):
    Bx, Tx = tokens.shape
    tokens = tokens.astype(jnp.int32)
    gather = dense_gather_index(tokens)

    def prep(w_ih, w_hh, b):
        whh = w_hh.T.astype(jnp.float32)
        whi = jax.lax.optimization_barrier(whh.astype(jnp.bfloat16))
        wlo = (whh - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        wM = jnp.concatenate([whi, whi, wlo], axis=1)  # [512, 384]
        tokw = jnp.concatenate(
            [w_ih + b[None, :], b[None, :], jnp.zeros((OH - 5, GATES))], axis=0
        ).astype(jnp.float32).T  # [512, 8]
        return wM, tokw

    wM_f, tokw_f = prep(params.w_ih_f, params.w_hh_f, params.b_f)
    wM_b, tokw_b = prep(params.w_ih_b, params.w_hh_b, params.b_b)
    z = jnp.zeros((GATES, K3), jnp.bfloat16)
    wBD = jnp.concatenate([
        jnp.concatenate([wM_f, z], axis=1),
        jnp.concatenate([z, wM_b], axis=1),
    ], axis=0)  # [1024, 768]

    grid = (Bx // tile,)
    kernel = functools.partial(_kernel_bd, T=Tx)
    last_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tx, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * GATES, 2 * K3), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((2 * K3, tile), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * 2 * Bx * Tx * GATES * HIDDEN,
            bytes_accessed=Bx * Tx * 4,
            transcendentals=2 * Bx * Tx * GATES,
        ),
        interpret=INTERPRET,
    )(
        tokens.T, gather.reshape(1, Bx), wBD, tokw_f, tokw_b,
    )
    return (
        jnp.dot(last_out.T, params.w_out.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + params.b_out
    )


def main_b():
    params = load_params("/root/repo/ribodetector_tpu/data/ribodetector_v1.npz")
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 5, (B, T)).astype(np.uint8))
    refl = np.asarray(jax.jit(
        lambda t: bilstm_logits(params, t, semantics="dense"))(tokens))
    ref_arg = refl.argmax(1)
    margin = np.abs(refl[:, 1] - refl[:, 0])

    def report(name, f):
        try:
            dt, lg = timeit(f, params, tokens)
            fl = np.asarray(jnp.argmax(lg, 1)) != ref_arg
            flips = int(fl.sum())
            worst = float(margin[fl].max()) if flips else 0.0
            print(f"{name}: {dt*1e3:8.2f} ms  {B/dt/1e6:6.2f} M reads/s"
                  f"  flips {flips} (worst margin {worst:.2e})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    report("unroll2 rerun      ",
           functools.partial(variant, tile=1024, unroll=2))
    report("unroll4            ",
           functools.partial(variant, tile=1024, unroll=4))
    report("blockdiag unroll2  ", variant_bd)


if len(sys.argv) > 1 and sys.argv[1] == "b" and __name__ == "__main__":
    main_b()
