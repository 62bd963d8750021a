"""Round-5 follow-up micros: the two remaining flagship tail stages.

After the r5 harvest (flag mode + final-select rework -> 6.80 ms/batch) the
1M x 1024 Q=256 split is: stream pass 4.40 ms (floor ~2.6), capture
selection 0.96, assembly 0.50, final select 1.04. This probe prices:

  capsel variants (isolated, [256, 1008] capture maxima + gid plumbing):
    ship      — lax.top_k(1008 -> 100) + gid argsort + take_alongs
    hier_b8   — two-level top_k over 8-wide blocks (126 block maxima)
    valsort   — top_k only (no gid ordering) lower bound

  pass variants (the in-kernel capture cost, real corpus):
    cappass   — the shipped kernel pass (gmax + b=8 peel capture)
    gmaxonly  — same kernel WITHOUT capture (score + group max only):
                cappass - gmaxonly = what the 8 peels x 123 steps cost

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r9b.py
Env: PROBE_PARTS=capsel,pass
Appends JSON lines to benchmarks/probe_r9b_results.jsonl.
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
N_CORPUS = 1_000_000
DIM = 1024
CHUNK = 8192
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r9b_results.jsonl")
PARTS = set(os.environ.get("PROBE_PARTS", "capsel,pass").split(","))


def _time_scan(label, run, args, scan_lens, reps=3, extra=None):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("iters",))
    def timed(iters, *a):
        def body(prev, _):
            p = jax.lax.optimization_barrier(prev)
            out = run(p, *a)
            return out[0], out[1]
        _, aux = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return aux

    try:
        windows = {}
        for n in scan_lens:
            t0 = time.perf_counter()
            np.asarray(timed(n, *args))
            print(f"{label} iters={n} compile+first "
                  f"{time.perf_counter() - t0:.0f}s", file=sys.stderr,
                  flush=True)
            best = min(
                (lambda t0=time.perf_counter(): (
                    np.asarray(timed(n, *args)),
                    time.perf_counter() - t0)[1])()
                for _ in range(reps))
            windows[n] = best
        n0, n1 = scan_lens
        per = (windows[n1] - windows[n0]) / (n1 - n0)
        rec = {"label": label, "ms_per_call": round(per * 1e3, 3),
               "loadavg": round(os.getloadavg()[0], 1),
               "windows_ms": {str(k): round(v * 1e3, 1)
                              for k, v in windows.items()}}
        if extra:
            rec.update(extra)
    except Exception as e:  # noqa: BLE001
        rec = {"label": label, "error": f"{type(e).__name__}: {e}"[:400]}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kirag_tpu.ops import pallas_exact as pe

    rng = np.random.default_rng(0)

    if "capsel" in PARTS:
        num_chunks = -(-N_CORPUS // CHUNK)
        b = pe._capture_budget(K, num_chunks, CHUNK // pe.LANES)
        cb = num_chunks * b
        capmax_host = rng.standard_normal((Q, cb)).astype(np.float32)
        gids_host = np.argsort(rng.random((Q, cb)), axis=-1).astype(np.int32)
        capmax_d = jax.device_put(capmax_host)
        gids_d = jax.device_put(gids_host)

        def ship(p, capmax, gids):
            capmax = capmax + (0.0 * p)
            cvals, cpos = jax.lax.top_k(capmax, K)
            gsel = jnp.take_along_axis(gids, cpos, axis=-1)
            order = jnp.argsort(gsel, axis=-1)
            gsel = jnp.take_along_axis(gsel, order, axis=-1)
            cpos = jnp.take_along_axis(cpos, order, axis=-1)
            return cvals[0, 0], (gsel.sum() + cpos.sum()).astype(jnp.float32)

        def hier_b8(p, capmax, gids):
            capmax = capmax + (0.0 * p)
            cvals, cpos = pe.hier_topk(capmax, K, block=8)
            gsel = jnp.take_along_axis(gids, cpos, axis=-1)
            order = jnp.argsort(gsel, axis=-1)
            gsel = jnp.take_along_axis(gsel, order, axis=-1)
            cpos = jnp.take_along_axis(cpos, order, axis=-1)
            return cvals[0, 0], (gsel.sum() + cpos.sum()).astype(jnp.float32)

        def valsort(p, capmax, gids):
            capmax = capmax + (0.0 * p)
            cvals, cpos = jax.lax.top_k(capmax, K)
            return cvals[0, 0], cpos.sum().astype(jnp.float32)

        for label, fn in (("capsel_ship", ship), ("capsel_hier_b8", hier_b8),
                          ("capsel_valsort", valsort)):
            _time_scan(label, fn, (capmax_d, gids_d), (64, 256),
                       extra={"cb": cb})

    if "pass" in PARTS:
        import ml_dtypes
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_pad = -(-N_CORPUS // CHUNK) * CHUNK
        corpus = np.zeros((n_pad, DIM), dtype=ml_dtypes.bfloat16)
        blk = rng.standard_normal((N_CORPUS, DIM), dtype=np.float32)
        blk /= np.linalg.norm(blk, axis=-1, keepdims=True)
        corpus[:N_CORPUS] = blk.astype(ml_dtypes.bfloat16)
        del blk
        queries = rng.standard_normal((Q, DIM), dtype=np.float32)
        corpus_d = jax.device_put(corpus)
        queries_d = jax.device_put(queries.astype(ml_dtypes.bfloat16))
        jax.block_until_ready((corpus_d, queries_d))
        del corpus
        print("transfer done", file=sys.stderr, flush=True)

        num_chunks = n_pad // CHUNK
        gpc = CHUNK // pe.LANES
        b = pe._capture_budget(K, num_chunks, gpc)

        def cap_pass(p, qs, c):
            qs = qs + (0.0 * p).astype(qs.dtype)
            valid = jnp.asarray(N_CORPUS, jnp.int32).reshape(1, 1)
            outs = pl.pallas_call(
                functools.partial(pe._stream_kernel, groups_per_chunk=gpc,
                                  chunk_size=CHUNK, b=b, quant="none",
                                  capdom=True),
                grid=(num_chunks,),
                in_specs=[
                    pl.BlockSpec((Q, DIM), lambda i: (0, 0)),
                    pl.BlockSpec((CHUNK, DIM), lambda i: (i, 0)),
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, gpc, Q), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, Q, b * pe.LANES), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, b, Q), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, b, Q), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, 1, Q), lambda i: (i, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((num_chunks, gpc, Q), jnp.float32),
                    jax.ShapeDtypeStruct((num_chunks, Q, b * pe.LANES),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((num_chunks, b, Q), jnp.int32),
                    jax.ShapeDtypeStruct((num_chunks, b, Q), jnp.float32),
                    jax.ShapeDtypeStruct((num_chunks, 1, Q), jnp.float32),
                ],
                interpret=False,
                **pe._compiler_params(False, parallel=True),
            )(qs, c, valid)
            s = (outs[0][:, 0, :].sum() + outs[1][:, 0, 0].sum()
                 + outs[3][:, 0, :].sum() + outs[4][:, 0, :].sum())
            return s, s

        def gmax_only(p, qs, c):
            qs = qs + (0.0 * p).astype(qs.dtype)
            valid = jnp.asarray(N_CORPUS, jnp.int32).reshape(1, 1)
            out = pl.pallas_call(
                functools.partial(pe._score_gmax_kernel,
                                  groups_per_chunk=gpc, chunk_size=CHUNK,
                                  chunked=False, with_scores=False,
                                  quant="none"),
                grid=(num_chunks,),
                in_specs=[
                    pl.BlockSpec((Q, DIM), lambda i: (0, 0)),
                    pl.BlockSpec((CHUNK, DIM), lambda i: (i, 0)),
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=[pl.BlockSpec((1, gpc, Q), lambda i: (i, 0, 0))],
                out_shape=[jax.ShapeDtypeStruct((num_chunks, gpc, Q),
                                                jnp.float32)],
                interpret=False,
                **pe._compiler_params(False, parallel=True),
            )(qs, c, valid)[0]
            s = out[:, 0, :].sum()
            return s, s

        _time_scan("pass_capture", cap_pass, (queries_d, corpus_d), (8, 32),
                   extra={"b": b})
        _time_scan("pass_gmaxonly", gmax_only, (queries_d, corpus_d), (8, 32))


if __name__ == "__main__":
    main()
