"""Round-5 micro-probe: _final_select variants at the flagship tail shape.

probe_r8 attributes ~2.0 ms of the 7.85 ms stream+capdom batch to what sits
above the assembly (full - capasm): `_final_select` (mask + exact top-k over
S*128 = 12800 candidates + row-id remap) plus the lax.cond fallback wrapper.
This probe prices final-select implementations in isolation on synthetic
inputs shaped exactly like the shipped path's ([Q=256, K=100, 128] f32
candidates, [Q, K] sorted group ids), with no corpus transfer and tiny
compiles:

  ship_hier   — the shipped _final_select (hier_topk block=16, iota remap)
  ship_flat   — same but one wide lax.top_k(12800)
  arith_hier  — hier + arithmetic remap (pos//128 -> small [Q,k] gather of
                gsel, instead of building + gathering a [Q, 12800] iota)
  arith_flat  — flat top_k + arithmetic remap
  hier_b32 / hier_b64 — block-size ladder for the two-level selection
  twolvl_g128 — group-level prefilter: per 128-lane group max, top_k over
                the K group maxima is the identity here (S == K), so skip

Oracle: every variant must return numpy-argsort top-k (ties to lower row id).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r9.py
Appends JSON lines to benchmarks/probe_r9_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

Q = 256
K = 100
S = K  # capture/gather impls assemble exactly k groups
N_VALID = 1_000_000
SCAN_LENS = (64, 256)
REPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r9_results.jsonl")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kirag_tpu.ops import pallas_exact as pe

    rng = np.random.default_rng(0)
    cand_host = rng.standard_normal((Q, S, pe.LANES)).astype(np.float32)
    # group ids: sorted ascending per query, sampled from the 1M/128 range,
    # last group straddling n_valid so the mask path is exercised
    gmax_groups = N_VALID // pe.LANES
    gsel_host = np.sort(
        rng.choice(gmax_groups + 1, size=(Q, S), replace=True), axis=-1
    ).astype(np.int32)

    # numpy oracle (lower-row-id ties)
    rows = gsel_host[:, :, None] * pe.LANES + np.arange(pe.LANES)[None, None]
    flat = np.where(rows < N_VALID, cand_host,
                    -np.inf).reshape(Q, S * pe.LANES)
    rows_flat = rows.reshape(Q, S * pe.LANES)
    oracle_idx = np.empty((Q, K), dtype=np.int64)
    for qi in range(Q):
        order = np.lexsort((rows_flat[qi], -flat[qi]))[:K]
        oracle_idx[qi] = rows_flat[qi][order]
    cand_d = jax.device_put(cand_host)
    gsel_d = jax.device_put(gsel_host)

    def arith_remap(cand, gsel, topk_fn):
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (Q, S, pe.LANES), 2)
        rows3 = gsel[:, :, None] * pe.LANES + lane3
        masked = jnp.where(rows3 < N_VALID, cand, -jnp.inf)
        vals, pos = topk_fn(masked.reshape(Q, S * pe.LANES), K)
        grp = pos // pe.LANES
        gsel_win = jnp.take_along_axis(gsel, grp, axis=-1)
        idx = gsel_win * pe.LANES + pos % pe.LANES
        return vals, jnp.where(jnp.isfinite(vals), idx, 0)

    variants = {
        "ship_hier": lambda c, g: pe._final_select(
            c, g, K, N_VALID, Q, "hier", False),
        "ship_flat": lambda c, g: pe._final_select(
            c, g, K, N_VALID, Q, "flat", False),
        "arith_hier": lambda c, g: arith_remap(c, g, pe.hier_topk),
        "arith_flat": lambda c, g: arith_remap(
            c, g, lambda x, k: jax.lax.top_k(x, k)),
        "hier_b32": lambda c, g: arith_remap(
            c, g, functools.partial(pe.hier_topk, block=32)),
        "hier_b64": lambda c, g: arith_remap(
            c, g, functools.partial(pe.hier_topk, block=64)),
    }
    only = (set(os.environ.get("PROBE_VARIANTS", "").split(","))
            if os.environ.get("PROBE_VARIANTS") else None)

    for label, fn in variants.items():
        if only is not None and label not in only:
            continue

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(c, g, iters, fn=fn):
            def body(prev, _):
                p = jax.lax.optimization_barrier(prev)
                delta = (0.0 * p).astype(c.dtype)
                vals, idx = fn(c + delta[None, None], g)
                return vals[0, 0], idx
            _, aux = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return aux[-1]

        try:
            # correctness first, outside timing
            got = np.asarray(run(cand_d, gsel_d, iters=1))
            mismatch = int((got.astype(np.int64) != oracle_idx).sum())
            windows = {}
            for n in SCAN_LENS:
                t0 = time.perf_counter()
                np.asarray(run(cand_d, gsel_d, iters=n))
                print(f"{label} iters={n} compile+first "
                      f"{time.perf_counter() - t0:.0f}s",
                      file=sys.stderr, flush=True)
                reps = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    np.asarray(run(cand_d, gsel_d, iters=n))
                    reps.append(time.perf_counter() - t0)
                windows[n] = min(reps)
            n0, n1 = SCAN_LENS
            per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
            rec = {"label": label, "ms_per_call": round(per_iter * 1e3, 3),
                   "mismatches": mismatch,
                   "loadavg": round(os.getloadavg()[0], 1),
                   "windows_ms": {str(k): round(v * 1e3, 1)
                                  for k, v in windows.items()}}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"label": label, "error": f"{type(e).__name__}: {e}"[:400]}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
