"""Kernel-level diagnostics for the round-5 performance work.

Measures, at real shapes, on whatever backend is active:
  1. attention FWD kernel per-application time across the stacked-batch sweep
     (the batch-cliff question: does per-pair cost rise past 2B=8?)
  2. attention BWD: the autodiff-era kernel (`_mha_bwd_call`, fp32 matmul
     inputs, softmax recomputed from scratch) vs the lse-based kernel
     (`mha_bwd_from_lse`, stream-dtype matmuls, one exp pass) at the training
     shape — the "where does the backward actually go" question.

Usage: python -m impx.eval.kernel_probe [--sweep-only|--bwd-only]
One JSON line per measurement (ms per kernel application).
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from impx.ops.attention import _interpret


def _timed(name, fn, K, unit="ms/app", extra=""):
    @jax.jit
    def run(seed):
        def body(acc, k):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed + k)
            return acc + fn(key), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(K) * 7)[0]

    float(run(jnp.asarray(10)))
    best = None
    for seed in (20, 30):
        t0 = time.perf_counter()
        float(run(jnp.asarray(seed)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = best / K * 1e3
    print(json.dumps({"metric": name, "value": round(ms, 4),
                      "unit": unit + (f" ({extra})" if extra else ""),
                      "vs_baseline": 0}), flush=True)
    return ms


def sweep_forward(n_kpts=2048, h=4, dh=64, K=100):
    from impx.ops.pallas.attention import mha_fused

    interp = _interpret()
    for tb in (8, 16, 32, 64):
        mask = jnp.ones((tb, n_kpts), bool)

        def app(key, tb=tb, mask=mask):
            ks = jax.random.split(key, 3)
            q = jax.random.normal(ks[0], (tb, h, n_kpts, dh), jnp.bfloat16)
            kk = jax.random.normal(ks[1], (tb, h, n_kpts, dh), jnp.bfloat16)
            v = jax.random.normal(ks[2], (tb, h, n_kpts, dh), jnp.bfloat16)
            out = mha_fused(q, kk, v, mask, interpret=interp)
            return jnp.sum(out.astype(jnp.float32)[0, 0, 0])

        ms = _timed(f"attn_fwd_2b{tb}_{n_kpts}", app, K)
        print(json.dumps({"metric": f"attn_fwd_2b{tb}_{n_kpts}_per8rows",
                          "value": round(ms * 8 / tb, 4),
                          "unit": "ms normalized to 8 stacked batch rows",
                          "vs_baseline": 0}), flush=True)


def bwd_compare(n=1024, tb=32, h=4, dh=64, K=60):
    from impx.ops.pallas.attention import (_mha_bwd_call, mha_bwd_from_lse,
                                           mha_fused_lse)

    interp = _interpret()
    mask = jnp.ones((tb, n), bool)
    mask3 = mask.astype(jnp.float32).reshape(tb, 1, n)

    def gen(key, dtype):
        ks = jax.random.split(key, 4)
        mk = lambda k: jax.random.normal(k, (tb, h, n, dh), dtype)
        return mk(ks[0]), mk(ks[1]), mk(ks[2]), mk(ks[3])

    for block_q in (256, 1024):
        for dtype in (jnp.bfloat16, jnp.float32):
            dname = "bf16" if dtype == jnp.bfloat16 else "fp32"

            def old_bwd(key, block_q=block_q, dtype=dtype):
                q, k, v, do = gen(key, dtype)
                dq, dk, dv = _mha_bwd_call(q, k, v, mask3, do, block_q,
                                           interp)
                return (jnp.sum(dq[0, 0, 0]) + jnp.sum(dk[0, 0, 0]) +
                        jnp.sum(dv[0, 0, 0])).astype(jnp.float32)

            def new_bwd(key, block_q=block_q, dtype=dtype):
                q, k, v, do = gen(key, dtype)
                o, lse = mha_fused_lse(q, k, v, mask, block_q=block_q,
                                       interpret=interp)
                dq, dk, dv = mha_bwd_from_lse(q, k, v, mask, lse, o, do,
                                              block_q=block_q,
                                              interpret=interp)
                return (jnp.sum(dq[0, 0, 0]) + jnp.sum(dk[0, 0, 0]) +
                        jnp.sum(dv[0, 0, 0])).astype(jnp.float32)

            def fwd_only(key, block_q=block_q, dtype=dtype):
                q, k, v, _ = gen(key, dtype)
                o, lse = mha_fused_lse(q, k, v, mask, block_q=block_q,
                                       interpret=interp)
                return jnp.sum(o.astype(jnp.float32)[0, 0, 0])

            for tag, fn in ((f"attn_fwdlse_{dname}_bq{block_q}_tb{tb}_{n}",
                             fwd_only),
                            (f"attn_bwd_old_{dname}_bq{block_q}_tb{tb}_{n}",
                             old_bwd),
                            # new = fwd(lse) + bwd chained; subtract the fwd
                            # line to isolate the backward alone
                            (f"attn_fwd_plus_bwd_lse_{dname}_bq{block_q}_tb{tb}_{n}",
                             new_bwd)):
                try:
                    _timed(tag, fn, K)
                except Exception as e:  # one config must not kill the probe
                    print(json.dumps({"metric": tag, "value": -1,
                                      "unit": f"FAILED: {type(e).__name__}",
                                      "vs_baseline": 0}), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep-only", action="store_true")
    ap.add_argument("--bwd-only", action="store_true")
    args = ap.parse_args(argv)
    if not args.bwd_only:
        sweep_forward()
    if not args.sweep_only:
        bwd_compare()


if __name__ == "__main__":
    main()
