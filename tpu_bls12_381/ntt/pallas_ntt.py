"""Fused in-VMEM NTT tile kernel + single-chip Bailey four-step.

The radix-2 ladder (ntt.py::_butterflies) streams the whole array
HBM->VMEM->HBM once per stage — log2(n) round trips.  This module
computes a full size-m NTT (all log2(m) stages) on a (K, BB, m) tile
entirely inside VMEM, so a large NTT factored as n = nA * nB (Bailey
four-step) costs just two VMEM-resident compute passes plus cheap
transposes:

    X[k2 + nB*k1] = sum_a w_n^(a*k2) w_nA^(a*k1)
                    ( sum_b w_nB^(b*k2) x[a + nA*b] )

The inter-NTT twiddle multiply (w_n^(a*k2)) and the inverse 1/n scale
are folded into the tile kernels (zero extra passes).  This is the
single-chip counterpart of parallel/ntt.py's sharded four-step (same
bracket, transposes instead of all_to_alls), and the TPU analog of the
reference's MixedRadix algorithm option (core/config.rs:168-212) and its
fused multi-stage butterfly kernels (ntt_kernels.cu:498-574) taken to
their limit: *every* stage fused into one kernel.

Per-stage twiddles are prepacked host-side into one full-width (S, K, m)
array (lane l of stage s holds w_{2^s}^(l mod 2^(s-1))) so the kernel
only ever does static contiguous slicing, lane rolls, and masked selects
— the op set Mosaic supports without relayouts.
"""

from __future__ import annotations

import threading
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FR, ops
from ..fields.pallas_ops import _interpret, _k_add, _k_mont_mul, _k_sub
from ..vecops import bit_reverse
from .domain import Domain, get_domain, _powers_on_device
from ..oracle import root_of_unity

K = FR.num_limbs

# VMEM budget: ~6 live (BB, m) copies of K limb planes during the ladder.
# BB * m <= 2^14 keeps that under ~8 MB on v5e; the ceiling comes from the
# detected chip profile (tuning.py, gpu_config.cuh analog).
def _tile_elems() -> int:
    from ..tuning import chip_profile

    return 1 << chip_profile().ntt_tile_log_elems


def _stage_twiddles(dom_tw, m: int):
    """(K, m/2) twiddle table -> (S, K, m) full-width per-stage prepack.

    The kernel's butterflies are lane-aligned (roll + masked select, no
    shape casts — Mosaic cannot re-tile reshapes like (BB, m)->(BB, g, ms)).
    Every lane l needs the twiddle w_{2^s}^(l mod 2^(s-1)) at stage s, so
    each stage row carries a full m-lane table (host/NumPy prepack).
    """
    tw = np.asarray(dom_tw)  # (K, m/2), tw[:, j] = w_m^j
    S = m.bit_length() - 1
    out = np.zeros((S, K, m), dtype=np.uint32)
    lanes = np.arange(m)
    for s in range(1, S + 1):
        half = 1 << (s - 1)
        stride = m >> s
        j = (lanes % half) * stride  # exponent of w_m per lane
        out[s - 1] = tw[:, j]
    return jnp.asarray(out)


def _tile_block(m: int, b: int) -> int:
    """Rows per grid step: VMEM-bounded, never more than the batch."""
    return max(1, min(b, _tile_elems() // m))


def _ntt_tile_kernel_factory(m: int, BB: int, fold_w: bool, fold_scale: bool):
    S = m.bit_length() - 1

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        tw_ref = refs[i]; i += 1
        w_ref = None
        sc_ref = None
        if fold_w:
            w_ref = refs[i]; i += 1
        if fold_scale:
            sc_ref = refs[i]; i += 1
        n_ref = refs[i]; i += 1
        n0_ref = refs[i]; i += 1
        o_ref = refs[i]

        n_rows = [n_ref[k, :] for k in range(K)]  # (m,) broadcastable
        n0 = n0_ref[0, 0]
        xs = [x_ref[k, :, :] for k in range(K)]  # (BB, m) each

        # lane-aligned DIT: at stage s, lane l pairs with l +- half; the
        # "even" operand e and "odd" operand o come from static rolls and
        # a low/high-half mask — no reshapes (Mosaic-friendly).
        lane = jax.lax.broadcasted_iota(jnp.int32, (BB, m), 1)
        for s in range(1, S + 1):
            half = 1 << (s - 1)
            lo_mask = (lane & half) == 0  # lane in low half of its group
            w_s = [tw_ref[s - 1, k, :] for k in range(K)]  # (m,)
            od = [
                jnp.where(lo_mask, jnp.roll(x, -half, axis=-1), x)
                for x in xs
            ]
            ev = [
                jnp.where(lo_mask, x, jnp.roll(x, half, axis=-1))
                for x in xs
            ]
            t = _k_mont_mul(K, od, [w[None, :] for w in w_s], n_rows, n0)
            hi = _k_add(ev, t, n_rows)
            lo = _k_sub(ev, t, n_rows)
            xs = [jnp.where(lo_mask, h, l) for h, l in zip(hi, lo)]

        if fold_w:
            ws = [w_ref[k, :, :] for k in range(K)]
            xs = _k_mont_mul(K, xs, ws, n_rows, n0)
        if fold_scale:
            # (m,) lanes, broadcast over sublanes only (Mosaic cannot
            # broadcast in sublanes and lanes at once)
            scb = [sc_ref[k, :][None, :] for k in range(K)]
            xs = _k_mont_mul(K, xs, scb, n_rows, n0)
        for k in range(K):
            o_ref[k, :, :] = xs[k]

    return kernel


@partial(jax.jit, static_argnums=(3,))
def _ntt_tile_call(x, stage_tw, consts, meta, w=None, scale=None):
    """x: (K, B, m) bit-reversed rows -> natural-order NTT rows.

    Optionally folds an elementwise multiply ``w`` and a global scalar
    multiply ``scale`` (K,) after the ladder.  ``w`` may cover fewer rows
    than x (shape (K, Bw, m) with B a multiple of Bw): its row blocks are
    re-served periodically — how a (nA, nB) four-step twiddle table
    applies to batched inputs laid out as (batch * nA) rows without
    materializing batch copies.
    """
    m, BB = meta
    ncol, n0 = consts
    Btot = x.shape[1]
    grid = Btot // BB
    data = pl.BlockSpec((K, BB, m), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    S = m.bit_length() - 1
    twspec = pl.BlockSpec((S, K, m), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((K, m), lambda i: (0, 0), memory_space=pltpu.VMEM)
    n0spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    scspec = pl.BlockSpec((K, m), lambda i: (0, 0), memory_space=pltpu.VMEM)

    fold_w = w is not None
    fold_scale = scale is not None
    kernel = _ntt_tile_kernel_factory(m, BB, fold_w, fold_scale)
    in_specs = [data, twspec]
    args = [x, stage_tw]
    if fold_w:
        wblocks = w.shape[1] // BB  # W row-blocks per period
        wspec = pl.BlockSpec((K, BB, m), lambda i: (0, i % wblocks, 0),
                             memory_space=pltpu.VMEM)
        in_specs.append(wspec)
        args.append(w)
    if fold_scale:
        in_specs.append(scspec)
        args.append(jnp.broadcast_to(scale.reshape(K, 1), (K, m)))
    in_specs += [nspec, n0spec]
    args += [ncol, n0]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=data,
        interpret=_interpret(),
    )(*args)


# -----------------------------------------------------------------------------
# Caches: per-(m) consts + stage twiddles, per-(log_n, dir) four-step W table.
# -----------------------------------------------------------------------------

_PREP_CACHE: dict = {}
_W_CACHE: dict = {}
_LOCK = threading.Lock()


def _consts_for(m: int):
    key = ("consts", m)
    with _LOCK:
        got = _PREP_CACHE.get(key)
    if got is None:
        ncol = jnp.asarray(
            np.broadcast_to(FR.modulus_limbs.astype(np.uint32)[:, None], (K, m))
        )
        n0 = jnp.full((1, 1), FR.n0_inv, dtype=jnp.uint32)
        got = (ncol, n0)
        with _LOCK:
            _PREP_CACHE[key] = got
    return got


def _stage_tw_for(log_m: int, inverse: bool):
    key = ("stw", log_m, inverse)
    with _LOCK:
        got = _PREP_CACHE.get(key)
    if got is None:
        dom = get_domain(log_m)
        got = _stage_twiddles(dom.itw if inverse else dom.tw, 1 << log_m)
        with _LOCK:
            _PREP_CACHE[key] = got
    return got


def _step_w(log_n: int, nA: int, nB: int, inverse: bool):
    """W[a, k2] = w_n^(+-a*k2), (K, nA, nB) Montgomery, built on device."""
    key = (log_n, nA, inverse)
    with _LOCK:
        got = _W_CACHE.get(key)
    if got is not None:
        return got
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, FR.modulus - 2, FR.modulus)
    row_base = _powers_on_device(w, nA)  # (K, nA) = w^a

    @jax.jit
    def build(rb):
        cur = rb
        Pm = ops.one_mont(FR, (nA, 1))
        total = 1
        while total < nB:
            grow = ops.mont_mul(FR, Pm, cur[:, :, None])
            Pm = jnp.concatenate([Pm, grow], axis=-1)
            cur = ops.mont_sqr(FR, cur)
            total *= 2
        return Pm[:, :, :nB]

    W = build(row_base)
    with _LOCK:
        _W_CACHE[key] = W
    return W


def release_fourstep_cache() -> None:
    with _LOCK:
        _PREP_CACHE.clear()
        _W_CACHE.clear()


# -----------------------------------------------------------------------------
# Single-chip four-step NTT
# -----------------------------------------------------------------------------


def _cap_log() -> int:
    """log2 of the largest tile-NTT length: the per-grid-step row block
    BB = tile_elems/m must be a multiple of Mosaic's 8-sublane
    granularity (the K=22 e2e crash at round 4 hit this: the 2^23
    domain's 4096-wide pass left BB=4 and Mosaic rejected the block)."""
    return (_tile_elems() // 8).bit_length() - 1


def _split_top(log_n: int):
    """(la, lb) split of the top-level Bailey factorization n = nA * nB.

    Balanced while both factors fit a tile (log_n <= 2*cap_log); above
    that the INNER factor nB takes everything one recursion level can
    handle (lb <= 2*cap_log) and the outer keeps >= 2^7 lanes so every
    tile pass stays at or above the 128-lane vreg width."""
    cap_log = _cap_log()
    if log_n <= 2 * cap_log:
        la = log_n // 2
    else:
        lb = min(2 * cap_log, log_n - 7)
        la = log_n - lb
    return la, log_n - la


def fourstep_supported(x) -> bool:
    """True when :func:`ntt_fourstep` handles arrays of this shape.

    The tile kernel computes NTTs to 2^cap_log lanes in one VMEM pass;
    one level of recursion (a Bailey split whose inner factor is itself
    four-stepped) extends that to la + 2*cap_log — on the v5e profile
    (cap_log=11) domains through 2^33, covering the reference's full
    2^32 domain range (ntt.cuh:60, bls12_381_params.cuh:136).  Shapes
    beyond that (or below the 2^10 minimum) take the radix-2 ladder."""
    if x.ndim < 2:
        return False
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if (1 << log_n) != n or log_n < 10:
        return False
    cap_log = _cap_log()
    la, lb = _split_top(log_n)
    return la <= cap_log and lb <= 2 * cap_log


def _fourstep_flat_builder(log_nA: int, log_nB: int, fold_scale: bool):
    """One jitted program for the whole flat four-step.

    The un-jitted orchestration issued ~8 separate device programs per
    NTT (transposes, bit-reverse gathers, two tile calls); the tunneled
    platform charges a fixed per-dispatch latency, so fusing the bracket
    into a single program removes most of the non-kernel wall time.
    Twiddle/const tables are explicit arguments (not closed-over device
    constants), keeping the jaxpr small and the AOT export cacheable.
    """
    nA, nB = 1 << log_nA, 1 << log_nB

    def run(x, stw_b, W, stw_a, ncol_b, ncol_a, n0c, scale):
        B = x.shape[1]
        n = nA * nB
        M = x.reshape(K, B, nB, nA).swapaxes(-1, -2)  # (K, B, nA, nB)
        BB1 = _tile_block(nB, nA)
        Mr = bit_reverse(M.reshape(K, B * nA, nB), axis=-1)
        M = _ntt_tile_call(Mr, stw_b, (ncol_b, n0c), (nB, BB1), w=W)
        M2 = M.reshape(K, B, nA, nB).swapaxes(-1, -2)
        M2r = bit_reverse(M2.reshape(K, B * nB, nA), axis=-1)
        M2 = _ntt_tile_call(
            M2r, stw_a, (ncol_a, n0c), (nA, _tile_block(nA, nB)),
            scale=scale if fold_scale else None,
        )
        out = M2.reshape(K, B, nB, nA).swapaxes(-1, -2)
        return out.reshape(K, B, n)

    return jax.jit(run)


def ntt_fourstep(x, inverse: bool = False, domain: Domain | None = None):
    """(K, ..., n) Montgomery Fr -> NTT along the last axis, natural in/out.

    Factors n = nA * nB and runs two fused tile-NTT passes with the
    inter-step twiddle multiply folded into the first and the 1/n scale
    (inverse) folded into the second, the whole bracket issued as ONE
    jitted (and AOT-cached) program.  Leading axes are batched: rows are
    laid out (batch * nA) and the W table is re-served periodically by
    the tile call (ntt_kernels.cu:968-1133's batched dispatch analog).
    Domains past 2^(2*cap_log) recurse once: the inner factor is itself
    four-stepped and the inter-step twiddle becomes one standalone
    elementwise multiply (see fourstep_supported).
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("NTT size must be a power of two")
    lead = x.shape[1:-1]
    B = 1
    for d in lead:
        B *= d
    log_nA, log_nB = _split_top(log_n)
    nA, nB = 1 << log_nA, 1 << log_nB
    cap = 1 << _cap_log()

    dom_n = domain or get_domain(log_n)
    xf = x.reshape(K, B, n)

    if nB <= cap:
        from ..fields import aot

        W = _step_w(log_n, nA, nB, inverse)
        ncol_b, n0c = _consts_for(nB)
        ncol_a, _ = _consts_for(nA)
        scale = dom_n.n_inv if inverse else jnp.zeros((K,), jnp.uint32)
        tag = (f"ntt4|{log_nA}|{log_nB}|{int(inverse)}|{B}")
        out = aot.dispatch(
            tag,
            lambda: _fourstep_flat_builder(log_nA, log_nB, inverse),
            (xf, _stage_tw_for(log_nB, inverse), W,
             _stage_tw_for(log_nA, inverse), ncol_b, ncol_a, n0c, scale),
            lazy=True)
        return out.reshape((K,) + lead + (n,))

    # one recursion level (domains past 2^(2*cap_log), e.g. the K=22
    # e2e's 2^23): the inner length-nB NTTs are themselves four-stepped
    # (lead dims (B, nA) batch them), and the inter-step twiddle W —
    # folded into the tile kernel in the flat case — becomes one
    # standalone elementwise multiply.  The recursive inverse call
    # already scales by 1/nB, so the outer pass folds only the
    # remaining 1/nA.
    from ..fields import fast

    M = xf.reshape(K, B, nB, nA).swapaxes(-1, -2)  # (K, B, nA, nB)
    Y = ntt_fourstep(M, inverse=inverse)           # (K, B, nA, nB)
    W = _step_w(log_n, nA, nB, inverse)            # (K, nA, nB)
    M = fast.mont_mul(FR, Y, jnp.broadcast_to(W[:, None], Y.shape))
    M = M.reshape(K, B * nA, nB)
    scale = get_domain(log_nA).n_inv if inverse else None

    # outer NTT over a (length nA); nA <= cap by _split_top construction
    M2 = M.reshape(K, B, nA, nB).swapaxes(-1, -2)  # (K, B, nB, nA)
    M2r = bit_reverse(M2.reshape(K, B * nB, nA), axis=-1)
    M2 = _ntt_tile_call(
        M2r, _stage_tw_for(log_nA, inverse), _consts_for(nA),
        (nA, _tile_block(nA, nB)), scale=scale,
    )

    # rows hold OUT[k2 + nB*k1]: transpose back to natural per batch row
    out = M2.reshape(K, B, nB, nA).swapaxes(-1, -2)
    return out.reshape((K,) + lead + (n,))
