"""Fused Sinkhorn optimal-transport kernel (Pallas/TPU).

Why: the matcher's Sinkhorn head iterates u/v marginal updates against a
[B, N+1, M+1] transport plan — 67 MB fp32 at B=4, N=M=2048. The XLA path
(impx/ops/sinkhorn.py:sink_algorithm) re-reads that plan from HBM twice per
iteration (~1.3 GB per batch for 20 iterations even with the bf16-plan
mitigation) and then materializes the full plan again for match extraction.
This kernel runs the whole head per batch element with the plan resident in
VMEM:

  phase 1 (streamed): row tiles of the raw [N, M] score matrix arrive via the
    automatic grid pipeline; each tile is dustbin-padded and row-softmaxed in
    fp32 and stored bf16 into a VMEM scratch — the plan never exists in HBM;
  phase 2 (VMEM-resident): all `iterations` u/v updates run as broadcast-
    multiply + reductions over the scratch (bf16 operands, fp32 accumulation —
    the precision contract of sink_algorithm's plan_dtype=bfloat16 path).
    Vector orientation is chosen so the loop needs no transposes: u lives as a
    column (sublane axis), v as a row (lane axis);
  phase 3 (fused epilogue): one more pass over the scratch emits everything
    the eval pipeline consumes — row/col argmax + max of the final plan's
    interior (mutual-NN match extraction) and row/col interior mass (EIMP
    pooling) — so the [N+1, M+1] plan is never written back to HBM at all.

Semantics match reference nets/layers.py:27-46 (non-log Sinkhorn, dustbin
marginal = count + 1) via the masked generalization proven in
impx/ops/sinkhorn.py. Inputs are pre-masked on the host (invalid cells ->
-1e30); invalid rows then softmax onto the dustbin column, and their zero
marginal (r_i = 0) forces u_i = 0, so they carry exactly no mass — the same
fixed point as sink_algorithm's explicit row masking.

The u/v vectors are returned so callers that need the full plan (training
loss, the SGMNet-style `run` API) can materialize it in ONE fused XLA pass:
plan = softmax(padded scores) * u * v  (see sinkhorn_plan_from_uv).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
EPS = 1e-8  # reference nets/layers.py:13


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


def _row_to_col(row: jax.Array) -> jax.Array:
    """(1, K) -> (K, 1) via an identity contraction (guaranteed Mosaic
    lowering for sublane<->lane moves; K is small)."""
    k = row.shape[1]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(row.dtype)
    return jax.lax.dot_general(eye, row, (((1,), (1,)), ((), ())),
                               preferred_element_type=row.dtype)


def _sinkhorn_kernel(
    bin_ref,      # SMEM (1, 1) fp32 — learned dustbin score
    valid0_ref,   # VMEM (1, 1, N) fp32
    valid1_ref,   # VMEM (1, 1, M) fp32
    dist_ref,     # VMEM (1, BR, M) fp32 — pre-masked score-row tile (streamed)
    u_ref,        # out VMEM (1, RP, 1) fp32 — row scalings (column layout)
    v_ref,        # out VMEM (1, 1, CP) fp32 — column scalings
    max0_ref,     # out VMEM (1, 1, N) fp32 — row max of final plan interior (-1 fill)
    idx0_ref,     # out VMEM (1, 1, N) int32 — row argmax
    idx1_ref,     # out VMEM (1, 1, M) int32 — col argmax
    rowmass_ref,  # out VMEM (1, 1, N) fp32 — row sum of final plan interior
    colmass_ref,  # out VMEM (1, 1, M) fp32 — col sum of final plan interior
    p_scratch,    # VMEM (RP, CP) bf16 — plan storage
    r_scratch,    # VMEM (RP, 1) fp32 — row marginals (column layout)
    *,
    iterations: int,
    n: int,
    m: int,
    block_rows: int,
):
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    rp, cp = p_scratch.shape
    br = block_rows
    bin_val = bin_ref[0, 0]

    # ---- phase 1: row-softmax this tile into the VMEM plan ----------------
    d = dist_ref[0]                                     # (BR, M) fp32, pre-masked
    s = jnp.concatenate(
        [d, jnp.full((br, 1), bin_val, jnp.float32),
         jnp.full((br, cp - m - 1), NEG, jnp.float32)], axis=1)  # (BR, CP)
    mx = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - mx)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    p_scratch[pl.ds(ti * br, br), :] = p.astype(p_scratch.dtype)

    # row marginal r = valid0 for interior rows, in column layout
    r_scratch[pl.ds(ti * br, br), :] = _row_to_col(
        valid0_ref[0, 0:1, pl.ds(ti * br, br)])

    # ---- phases 2+3 run once, after the last tile has landed ---------------
    @pl.when(ti == n_tiles - 1)
    def _():
        valid1 = valid1_ref[0, 0, :]                       # (M,)
        n0 = jnp.sum(valid0_ref[0, 0, :])
        n1 = jnp.sum(valid1)

        # dustbin row of p: softmax of a constant-bin row = uniform over valid
        inv = 1.0 / (n1 + 1.0)
        dust = jnp.concatenate(
            [jnp.where(valid1[None, :] > 0, inv, 0.0),
             jnp.full((1, 1), inv, jnp.float32),
             jnp.zeros((1, cp - m - 1), jnp.float32)], axis=1)
        p_scratch[pl.ds(n, 1), :] = dust.astype(p_scratch.dtype)
        if rp > n + 1:  # alignment pad rows: zero (stale across batch steps)
            p_scratch[pl.ds(n + 1, rp - n - 1), :] = jnp.zeros(
                (rp - n - 1, cp), p_scratch.dtype)

        # marginal tails: r[n] = n0+1, pads 0  (sink_algorithm layers.py:41-44)
        r_scratch[pl.ds(n, rp - n), :] = jnp.concatenate(
            [jnp.full((1, 1), n0 + 1.0, jnp.float32),
             jnp.zeros((rp - n - 1, 1), jnp.float32)], axis=0)
        c = jnp.concatenate(
            [valid1[None, :], jnp.full((1, 1), n1 + 1.0, jnp.float32),
             jnp.zeros((1, cp - m - 1), jnp.float32)], axis=1)  # (1, CP)

        # u/v live directly in the output refs (no extra VMEM); all work is
        # tiled over row blocks so temporaries stay at (BR, CP) — the full
        # (RP, CP) matrix is never materialized outside the bf16 scratch.
        u_ref[0] = jnp.ones((rp, 1), jnp.float32)
        v_ref[0, 0, :] = jnp.ones((cp,), jnp.float32)
        nt = n // block_rows                            # static tile count
        tail0, tail = nt * br, rp - nt * br             # static tail (<= 16 rows)

        def _tile_f32(lo, size):
            return p_scratch[pl.ds(lo, size), :].astype(jnp.float32)

        def body(_, carry):
            vb = (v_ref[0, 0:1, :].astype(p_scratch.dtype)
                  .astype(jnp.float32))                          # (1, CP)

            def upd_u(t, _c):
                pv = jnp.sum(_tile_f32(t * br, br) * vb, axis=1, keepdims=True)
                u_ref[0, pl.ds(t * br, br), :] = (
                    r_scratch[pl.ds(t * br, br), :] / (pv + EPS))
                return _c

            jax.lax.fori_loop(0, nt, upd_u, 0)
            pv = jnp.sum(_tile_f32(tail0, tail) * vb, axis=1, keepdims=True)
            u_ref[0, pl.ds(tail0, tail), :] = (
                r_scratch[pl.ds(tail0, tail), :] / (pv + EPS))

            def upd_v(t, pu):
                ub = (u_ref[0, pl.ds(t * br, br), :].astype(p_scratch.dtype)
                      .astype(jnp.float32))
                return pu + jnp.sum(_tile_f32(t * br, br) * ub, axis=0,
                                    keepdims=True)

            pu = jax.lax.fori_loop(0, nt, upd_v,
                                   jnp.zeros((1, cp), jnp.float32))
            ub = (u_ref[0, pl.ds(tail0, tail), :].astype(p_scratch.dtype)
                  .astype(jnp.float32))
            pu = pu + jnp.sum(_tile_f32(tail0, tail) * ub, axis=0, keepdims=True)
            v_ref[0, 0:1, :] = c / (pu + EPS)
            return carry

        jax.lax.fori_loop(0, iterations, body, 0)
        v = v_ref[0, 0:1, :]                             # (1, CP)

        # ---- phase 3: fused match stats + pooling masses -------------------
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
        col_ok = (cols < m) & (jnp.concatenate(
            [valid1[None, :], jnp.zeros((1, cp - m), jnp.float32)], axis=1) > 0)

        def stats(t, carry):
            cmax, carg, cmass = carry
            pt = p_scratch[pl.ds(t * br, br), :].astype(jnp.float32)
            ut = u_ref[0, pl.ds(t * br, br), :]      # (br, 1), written above
            v0t = r_scratch[pl.ds(t * br, br), :]    # == valid0 (interior rows)
            val = pt * ut * v                                     # final plan tile
            ok = col_ok & (v0t > 0)
            filled = jnp.where(ok, val, -1.0)
            max0_ref[0, 0, pl.ds(t * br, br)] = jnp.max(filled, axis=1)
            idx0_ref[0, 0, pl.ds(t * br, br)] = jnp.argmax(filled, axis=1).astype(
                jnp.int32)
            masked = jnp.where(ok, val, 0.0)
            rowmass_ref[0, 0, pl.ds(t * br, br)] = jnp.sum(masked, axis=1)
            tmax = jnp.max(filled, axis=0, keepdims=True)         # (1, CP)
            targ = jnp.argmax(filled, axis=0).astype(jnp.int32)[None, :] + t * br
            upd = tmax > cmax                                     # strict: first max wins
            return (jnp.where(upd, tmax, cmax), jnp.where(upd, targ, carg),
                    cmass + jnp.sum(masked, axis=0, keepdims=True))

        cmax0 = jnp.full((1, cp), -1.0, jnp.float32)
        carg0 = jnp.zeros((1, cp), jnp.int32)
        cmass0 = jnp.zeros((1, cp), jnp.float32)
        _, carg, cmass = jax.lax.fori_loop(0, n // block_rows, stats,
                                           (cmax0, carg0, cmass0))
        idx1_ref[0, 0, :] = carg[0, :m]
        colmass_ref[0, 0, :] = cmass[0, :m]


@functools.partial(
    jax.jit, static_argnames=("iterations", "block_rows", "interpret"))
def sinkhorn_fused_stats(
    dist: jax.Array,
    dustbin: jax.Array,
    iterations: int,
    valid0: jax.Array | None = None,
    valid1: jax.Array | None = None,
    block_rows: int = 128,
    interpret: bool = False,
):
    """Run the full Sinkhorn head without materializing the plan in HBM.

    dist [B, N, M] fp32 scores (pre-dustbin), dustbin scalar. Returns a dict:
      u [B, N+1], v [B, M+1]   — final scalings (plan = softmax_pad * u ⊗ v)
      max0 [B, N], idx0 [B, N] — row max/argmax of the plan interior (-1 fill
                                 at invalid cells, matching compute_matches)
      idx1 [B, M]              — col argmax
      rowmass [B, N], colmass [B, M] — interior row/col mass (EIMP pooling)

    Note: at rows/cols that are fully invalid the stats are computed over
    exact zeros instead of the XLA path's -1 fill; final match indices are
    identical (zero mscore never survives the threshold).
    """
    b, n, m = dist.shape
    br = min(block_rows, n)
    assert n % br == 0, (n, br)
    rp = _round_up(n + 1, 16)   # bf16 sublane tile (also fp32-compatible)
    cp = _round_up(m + 1, 128)
    # plan storage: fp32 while it fits comfortably in VMEM (exact parity with
    # the XLA path's fp32 final plan); bf16 at the 2048-keypoint bucket (the
    # precision contract of sink_algorithm's plan_dtype=bfloat16 path)
    plan_dtype = jnp.float32 if rp * cp * 4 <= 6 * 1024 * 1024 else jnp.bfloat16

    f0 = (jnp.ones((b, n), jnp.float32) if valid0 is None
          else valid0.astype(jnp.float32))
    f1 = (jnp.ones((b, m), jnp.float32) if valid1 is None
          else valid1.astype(jnp.float32))
    f0_3, f1_3 = f0[:, None, :], f1[:, None, :]
    # pre-mask on the host: fuses into the producing einsum's epilogue under
    # jit, so the kernel needs no column-layout validity plumbing
    dist = jnp.where((f0[:, :, None] > 0) & (f1[:, None, :] > 0),
                     dist.astype(jnp.float32), NEG)
    bin2 = jnp.asarray(dustbin, jnp.float32).reshape(1, 1)

    grid = (b, n // br)
    last_resort_vmem_limit = max(
        32 * 1024 * 1024,
        rp * cp * jnp.dtype(plan_dtype).itemsize + 24 * 1024 * 1024)
    kernel = functools.partial(
        _sinkhorn_kernel, iterations=iterations, n=n, m=m, block_rows=br)
    u, v, max0, idx0, idx1, rowmass, colmass = pl.pallas_call(
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
            pl.BlockSpec((1, 1, n), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rp, cp), plan_dtype),
            pltpu.VMEM((rp, 1), jnp.float32),
        ],
        # the 2048 bucket needs ~19 MB (9 MB plan scratch + streamed dist
        # tiles + column-layout vectors) — above the 16 MB default scoped
        # limit, well within physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=last_resort_vmem_limit),
        interpret=interpret,
    )(bin2, f0_3, f1_3, dist)
    return {
        "u": u[:, : n + 1, 0],
        "v": v[:, 0, : m + 1],
        "max0": max0[:, 0],
        "idx0": idx0[:, 0],
        "idx1": idx1[:, 0],
        "rowmass": rowmass[:, 0],
        "colmass": colmass[:, 0],
    }


def sinkhorn_plan_from_uv(dist, dustbin, u, v, valid0=None, valid1=None):
    """Materialize the [B, N+1, M+1] plan from kernel u/v in ONE XLA pass
    (read dist once, write plan once — vs 40 plan-sized HBM reads on the XLA
    loop path). Identical formula to sink_algorithm's return: fp32 row softmax
    of the masked padded scores, scaled by u ⊗ v."""
    from impx.ops.sinkhorn import _pad_with_dustbin, _padded_masks

    b, n, m = dist.shape
    _, _, v0p, v1p = _padded_masks(b, n, m, valid0, valid1, dist.dtype)
    M = _pad_with_dustbin(dist, dustbin)
    M = jnp.where(v0p[:, :, None] & v1p[:, None, :], M, NEG)
    p = jax.nn.softmax(M, axis=-1)
    return p * u[:, :, None] * v[:, None, :]


def sinkhorn_fused(dist, dustbin, iterations, valid0=None, valid1=None,
                   block_rows: int = 128, interpret: bool = False):
    """Drop-in for sink_algorithm(..., plan_dtype=bfloat16): fused-kernel
    iterations + single-pass plan materialization."""
    stats = sinkhorn_fused_stats(dist, dustbin, iterations, valid0, valid1,
                                 block_rows=block_rows, interpret=interpret)
    return sinkhorn_plan_from_uv(dist, dustbin, stats["u"], stats["v"],
                                 valid0, valid1)
