"""Fused LOG-DOMAIN Sinkhorn optimal-transport kernel (Pallas/TPU).

The numerically-stable log-space head (reference nets/superglue.py:180-209:
`log_sinkhorn_iterations` + `log_optimal_transport`) as a single iterated
log-sum-exp kernel — the BASELINE.json north star names exactly this fusion.
Same architecture as the non-log kernel (impx/ops/pallas/sinkhorn.py):

  phase 1 (streamed): row tiles of the raw [N, M] score matrix arrive via the
    automatic grid pipeline, are dustbin-padded/masked and stored into a VMEM
    scratch Z — the padded log-potential matrix never exists in HBM;
  phase 2 (VMEM-resident): all `iterations` u/v updates run as tiled
    log-sum-exp reductions over Z (fp32 math; Z storage is bf16 only at the
    2048 bucket where fp32 doesn't fit VMEM):
      u_i = log_mu_i - logsumexp_j(Z_ij + v_j)
      v_j = log_nu_j - logsumexp_i(Z_ij + u_i)   (online/flash-style over tiles)
  phase 3 (fused epilogue): row/col max + argmax of the final log-plan
    interior (Z + u + v - norm) so SuperGlue-style match extraction
    (superglue.py:424-437: scores.exp() -> max) needs no HBM plan either.

Exact semantics of impx/ops/sinkhorn.py:log_optimal_transport (itself parity-
tested against the torch reference), masked: invalid rows/cols carry
log_mu/log_nu = -1e30 and Z = -1e30, the identical fixed point.

The u/v vectors are returned so callers that need the full log-plan (the
SuperGlue training loss) can materialize it in ONE fused XLA pass
(log_plan_from_uv). `log_optimal_transport_fused` wraps kernel + one-pass
materialization behind log_optimal_transport's interface with a custom VJP:
the backward rematerializes through the XLA path (exact same math), so
training never stores the per-iteration plans (20 x [B,N+1,M+1]) the plain
XLA loop would keep — the fused head is both the fast forward and the
low-memory training head for bf16.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


def _row_to_col(row: jax.Array) -> jax.Array:
    """(1, K) -> (K, 1) via an identity contraction (guaranteed Mosaic
    lowering for sublane<->lane moves)."""
    k = row.shape[1]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(row.dtype)
    return jax.lax.dot_general(eye, row, (((1,), (1,)), ((), ())),
                               preferred_element_type=row.dtype)


def _log_sinkhorn_kernel(
    bin_ref,      # SMEM (1, 1) fp32 — learned dustbin score
    valid0_ref,   # VMEM (1, 1, N) fp32
    valid1_ref,   # VMEM (1, 1, M) fp32
    dist_ref,     # VMEM (1, BR, M) fp32 — pre-masked score-row tile (streamed)
    u_ref,        # out VMEM (1, RP, 1) fp32 — row log-scalings (column layout)
    v_ref,        # out VMEM (1, 1, CP) fp32 — column log-scalings
    max0_ref,     # out VMEM (1, 1, N) fp32 — row max of final log-plan interior
    idx0_ref,     # out VMEM (1, 1, N) int32 — row argmax
    idx1_ref,     # out VMEM (1, 1, M) int32 — col argmax
    z_scratch,    # VMEM (RP, CP) — padded masked scores
    mu_scratch,   # VMEM (RP, 1) fp32 — valid0 (phase 1) then log_mu (phase 2)
    *,
    iterations: int,
    n: int,
    m: int,
    block_rows: int,
):
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    rp, cp = z_scratch.shape
    br = block_rows
    bin_val = bin_ref[0, 0]

    # ---- phase 1: land this tile of padded scores in VMEM ------------------
    d = dist_ref[0]                                     # (BR, M) fp32, pre-masked
    v0col = _row_to_col(valid0_ref[0, 0:1, pl.ds(ti * br, br)])  # (BR, 1)
    # the dustbin CELL of an invalid row is masked too (XLA path masks the
    # whole row via v0p, impx/ops/sinkhorn.py:131) — getting this wrong
    # flips u at invalid rows from 0 to -1e30
    z = jnp.concatenate(
        [d, jnp.where(v0col > 0, bin_val, NEG),
         jnp.full((br, cp - m - 1), NEG, jnp.float32)], axis=1)  # (BR, CP)
    z_scratch[pl.ds(ti * br, br), :] = z.astype(z_scratch.dtype)
    mu_scratch[pl.ds(ti * br, br), :] = v0col

    # ---- phases 2+3 run once, after the last tile has landed ---------------
    @pl.when(ti == n_tiles - 1)
    def _():
        valid1 = valid1_ref[0, 0, :]                      # (M,)
        n0 = jnp.sum(valid0_ref[0, 0, :])
        n1 = jnp.sum(valid1)
        norm = -jnp.log(n0 + n1)                          # scalar

        # dustbin row of Z: bin at valid cols + the corner, NEG elsewhere
        dust = jnp.concatenate(
            [jnp.where(valid1[None, :] > 0, bin_val, NEG),
             jnp.full((1, 1), bin_val, jnp.float32),
             jnp.full((1, cp - m - 1), NEG, jnp.float32)], axis=1)
        z_scratch[pl.ds(n, 1), :] = dust.astype(z_scratch.dtype)
        if rp > n + 1:  # alignment pad rows (stale across batch steps)
            z_scratch[pl.ds(n + 1, rp - n - 1), :] = jnp.full(
                (rp - n - 1, cp), NEG, z_scratch.dtype)

        # log marginals (reference superglue.py:196-199 via the masked
        # generalization of impx/ops/sinkhorn.py:133-135)
        mu_scratch[:, :] = jnp.where(mu_scratch[:, :] > 0, norm, NEG)
        # dustbin row marginal, then NEG the alignment pad rows (phase 1 never
        # writes them — stale values there would resurrect dead rows)
        mu_scratch[pl.ds(n, rp - n), :] = jnp.concatenate(
            [jnp.full((1, 1), jnp.log(n1) + norm, jnp.float32),
             jnp.full((rp - n - 1, 1), NEG, jnp.float32)], axis=0)
        nu = jnp.concatenate(
            [jnp.where(valid1[None, :] > 0, norm, NEG),
             jnp.full((1, 1), jnp.log(n0) + norm, jnp.float32),
             jnp.full((1, cp - m - 1), NEG, jnp.float32)], axis=1)  # (1, CP)

        u_ref[0] = jnp.zeros((rp, 1), jnp.float32)
        v_ref[0, 0, :] = jnp.zeros((cp,), jnp.float32)
        nt = n // block_rows                            # static tile count
        tail0, tail = nt * br, rp - nt * br             # static tail (<= 16 rows)

        def _tile_f32(lo, size):
            return z_scratch[pl.ds(lo, size), :].astype(jnp.float32)

        def _row_lse(t):                                 # (rows, CP) -> (rows, 1)
            mx = jnp.max(t, axis=1, keepdims=True)
            # fully-NEG rows: shift by NEG would make exp(0)=1 per cell; the
            # resulting lse = NEG + log(cp) ~ NEG which is the correct limit
            return mx + jnp.log(jnp.sum(jnp.exp(t - mx), axis=1, keepdims=True))

        def body(_, carry):
            vb = v_ref[0, 0:1, :]                                 # (1, CP)

            def upd_u(lo, size):
                t = _tile_f32(lo, size) + vb
                u_ref[0, pl.ds(lo, size), :] = (
                    mu_scratch[pl.ds(lo, size), :] - _row_lse(t))

            def upd_u_loop(t, _c):
                upd_u(t * br, br)
                return _c

            jax.lax.fori_loop(0, nt, upd_u_loop, 0)
            upd_u(tail0, tail)

            # online (flash-style) column logsumexp of Z + u over row tiles
            def upd_v(t, carry):
                mcol, scol = carry
                tz = _tile_f32(t * br, br) + u_ref[0, pl.ds(t * br, br), :]
                tmax = jnp.max(tz, axis=0, keepdims=True)         # (1, CP)
                mnew = jnp.maximum(mcol, tmax)
                scol = scol * jnp.exp(mcol - mnew) + jnp.sum(
                    jnp.exp(tz - mnew), axis=0, keepdims=True)
                return mnew, scol

            m0 = jnp.full((1, cp), NEG, jnp.float32)
            s0 = jnp.zeros((1, cp), jnp.float32)
            mcol, scol = jax.lax.fori_loop(0, nt, upd_v, (m0, s0))
            tz = _tile_f32(tail0, tail) + u_ref[0, pl.ds(tail0, tail), :]
            tmax = jnp.max(tz, axis=0, keepdims=True)
            mnew = jnp.maximum(mcol, tmax)
            scol = scol * jnp.exp(mcol - mnew) + jnp.sum(
                jnp.exp(tz - mnew), axis=0, keepdims=True)
            v_ref[0, 0:1, :] = nu - (mnew + jnp.log(scol))
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)
        v = v_ref[0, 0:1, :]                             # (1, CP)

        # ---- phase 3: fused match stats on the final log-plan --------------
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
        col_ok = (cols < m) & (jnp.concatenate(
            [valid1[None, :], jnp.zeros((1, cp - m), jnp.float32)], axis=1) > 0)

        def stats(t, carry):
            cmax, carg = carry
            tz = _tile_f32(t * br, br)
            ut = u_ref[0, pl.ds(t * br, br), :]           # (br, 1)
            v0t = mu_scratch[pl.ds(t * br, br), :]        # log_mu: NEG at invalid
            val = tz + ut + v - norm                      # final log-plan tile
            ok = col_ok & (v0t > NEG * 0.5)
            filled = jnp.where(ok, val, NEG)
            max0_ref[0, 0, pl.ds(t * br, br)] = jnp.max(filled, axis=1)
            idx0_ref[0, 0, pl.ds(t * br, br)] = jnp.argmax(filled, axis=1).astype(
                jnp.int32)
            tmax = jnp.max(filled, axis=0, keepdims=True)          # (1, CP)
            targ = jnp.argmax(filled, axis=0).astype(jnp.int32)[None, :] + t * br
            upd = tmax > cmax                                      # first max wins
            return jnp.where(upd, tmax, cmax), jnp.where(upd, targ, carg)

        cmax0 = jnp.full((1, cp), NEG, jnp.float32)
        carg0 = jnp.zeros((1, cp), jnp.int32)
        _, carg = jax.lax.fori_loop(0, n // block_rows, stats, (cmax0, carg0))
        idx1_ref[0, 0, :] = carg[0, :m]


@functools.partial(
    jax.jit, static_argnames=("iterations", "block_rows", "interpret"))
def log_sinkhorn_fused_stats(
    dist: jax.Array,
    dustbin: jax.Array,
    iterations: int,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
    block_rows: int = 128,
    interpret: bool = False,
):
    """Run the full log-domain Sinkhorn head without an HBM plan.

    dist [B, N, M] fp32 scores (pre-dustbin), dustbin scalar. Returns a dict:
      u [B, N+1], v [B, M+1]  — final log-scalings
                                 (log_plan = Z + u ⊗ v - norm, see
                                 log_plan_from_uv)
      max0 [B, N], idx0 [B, N] — row max/argmax of the log-plan interior
                                 (NEG fill at invalid cells); matches
                                 scores[:, :-1, :-1].max(2) of the reference
                                 superglue.py:425 (exp is monotonic)
      idx1 [B, M]              — col argmax
    """
    b, n, m = dist.shape
    br = min(block_rows, n)
    if n % br:  # fall back to one row tile when n isn't block-aligned
        br = n
    rp = _round_up(n + 1, 16)
    cp = _round_up(m + 1, 128)
    z_dtype = jnp.float32 if rp * cp * 4 <= 6 * 1024 * 1024 else jnp.bfloat16

    f0 = (jnp.ones((b, n), jnp.float32) if valid0 is None
          else valid0.astype(jnp.float32))
    f1 = (jnp.ones((b, m), jnp.float32) if valid1 is None
          else valid1.astype(jnp.float32))
    dist = jnp.where((f0[:, :, None] > 0) & (f1[:, None, :] > 0),
                     dist.astype(jnp.float32), NEG)
    bin2 = jnp.asarray(dustbin, jnp.float32).reshape(1, 1)

    grid = (b, n // br)
    vmem_limit = max(
        32 * 1024 * 1024,
        rp * cp * jnp.dtype(z_dtype).itemsize + 24 * 1024 * 1024)
    kernel = functools.partial(
        _log_sinkhorn_kernel, iterations=iterations, n=n, m=m, block_rows=br)
    u, v, max0, idx0, idx1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, ti: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, m), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rp, 1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cp), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rp, cp), z_dtype),
            pltpu.VMEM((rp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(bin2, f0[:, None, :], f1[:, None, :], dist)
    return {
        "u": u[:, : n + 1, 0],
        "v": v[:, 0, : m + 1],
        "max0": max0[:, 0],
        "idx0": idx0[:, 0],
        "idx1": idx1[:, 0],
    }


def log_plan_from_uv(dist, dustbin, u, v, valid0=None, valid1=None):
    """Materialize the [B, N+1, M+1] LOG plan from kernel u/v in ONE XLA pass
    (identical formula to log_optimal_transport's return: Z + u + v - norm)."""
    from impx.ops.sinkhorn import _pad_with_dustbin, _padded_masks

    b, n, m = dist.shape
    f0, f1, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, jnp.float32)
    Z = _pad_with_dustbin(dist.astype(jnp.float32), dustbin)
    Z = jnp.where(v0p[:, :, None] & v1p[:, None, :], Z, NEG)
    norm = -jnp.log(jnp.sum(f0, axis=1, keepdims=True)
                    + jnp.sum(f1, axis=1, keepdims=True))  # [B, 1]
    return Z + u[:, :, None] + v[:, None, :] - norm[:, :, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 5, 6))
def log_optimal_transport_fused(dist, dustbin, iterations,
                                valid0=None, valid1=None,
                                block_rows: int = 128, interpret: bool = False):
    """Drop-in for impx.ops.sinkhorn.log_optimal_transport: fused-kernel
    u/v iterations + single-pass log-plan materialization.

    Differentiable: the backward rematerializes the XLA log-Sinkhorn
    (identical math) and differentiates through it, so the forward never
    stores per-iteration plans — the remat contract of jax.checkpoint, with
    a kernel-fast primal."""
    stats = log_sinkhorn_fused_stats(dist, dustbin, iterations, valid0, valid1,
                                     block_rows=block_rows, interpret=interpret)
    return log_plan_from_uv(dist, dustbin, stats["u"], stats["v"],
                            valid0, valid1)


def _lot_fwd(dist, dustbin, iterations, valid0, valid1, block_rows, interpret):
    out = log_optimal_transport_fused(dist, dustbin, iterations, valid0, valid1,
                                      block_rows, interpret)
    return out, (dist, dustbin, valid0, valid1)


def _lot_bwd(iterations, block_rows, interpret, res, g):
    from impx.ops.sinkhorn import log_optimal_transport

    dist, dustbin, valid0, valid1 = res
    _, vjp = jax.vjp(
        lambda d, b: log_optimal_transport(d, b, iterations, valid0, valid1),
        dist, dustbin)
    gd, gb = vjp(g)
    return gd, gb, None, None


log_optimal_transport_fused.defvjp(_lot_fwd, _lot_bwd)
