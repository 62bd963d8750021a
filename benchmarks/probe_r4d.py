"""Round-4d: stream-impl assembly-stage attribution + optimization variants.

probe_r4b put the stream pipeline at: pass 4.26 / passsel 4.97 / nofb 7.21 /
full 7.59 ms — so 2.24 ms is capture->candidate assembly + final select and
0.38 ms is the membership check + lax.cond. This probe splits the 2.24 ms
and times two redesigns of the tail (shipped-code kernels, probe-local
tails):

  nofb       — anchor (shipped assembly, _STREAM_ASSERT_CAPTURE)
  asm        — passsel + argsort + membership eq + one-hot assembly
               (no final_select): isolates final_select as nofb - asm
  v_einsum   — assembly via einsum on the capture's NATIVE [C,Q,B,L] layout
               (XLA fuses the transpose into the contraction) + final_select
  v_capdom   — selection moved to the CAPTURE domain: top-k over the 1024
               capture maxima (not the 7813 group maxima), exactness via a
               residual check (kth selected capture max >= max gmax of any
               non-captured group), einsum assembly, final_select
  v_capflat  — v_capdom with lax.top_k for the 1024-domain selection

Validation: queries are corpus rows; idx[:,0] must equal the row (and
v_capdom asserts its residual check passes on every iteration).
Appends JSON lines to benchmarks/probe_r4d_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("SMOKE", "0") == "1"  # CPU interpret-mode correctness
N_CORPUS = 20_000 if SMOKE else 1_000_000
DIM = 256 if SMOKE else 1024
N_QUERIES = 16 if SMOKE else 256
TOPK = 100
SCAN_LENS = (1, 2) if SMOKE else (8, 32)
REPS = 1 if SMOKE else 3
INTERPRET = SMOKE
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4d_results.jsonl")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from jax.experimental import pallas as pl

    from kirag_tpu.ops import pallas_exact as pe

    rng = np.random.default_rng(0)
    corpus_host = rng.standard_normal((N_CORPUS, DIM), dtype=np.float32)
    corpus_host /= np.linalg.norm(corpus_host, axis=-1, keepdims=True)
    query_rows = rng.integers(0, N_CORPUS, size=N_QUERIES)
    queries_host = corpus_host[query_rows].copy()

    chunk = 2048 if SMOKE else 8192
    n_pad = -(-N_CORPUS // chunk) * chunk
    corpus_bf16 = np.zeros((n_pad, DIM), dtype=ml_dtypes.bfloat16)
    corpus_bf16[:N_CORPUS] = corpus_host.astype(ml_dtypes.bfloat16)
    del corpus_host
    corpus = jax.device_put(corpus_bf16)
    queries = jax.device_put(queries_host.astype(ml_dtypes.bfloat16))
    rows_d = jax.device_put(jnp.asarray(query_rows, dtype=jnp.int32))
    corpus.block_until_ready()
    del corpus_bf16
    print("transfer done", file=sys.stderr, flush=True)

    num_chunks = n_pad // chunk
    gpc = chunk // pe.LANES
    groups = n_pad // pe.LANES
    b = pe._capture_budget(TOPK, num_chunks, gpc)
    cb = num_chunks * b

    def stream_pass(qs, c):
        valid_arr = jnp.asarray(N_CORPUS, dtype=jnp.int32).reshape(1, 1)
        from jax.experimental.pallas import tpu as pltpu
        in_specs = [
            pl.BlockSpec((N_QUERIES, DIM), lambda i: (0, 0)),
            pl.BlockSpec((chunk, DIM), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, gpc, N_QUERIES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, N_QUERIES, b * pe.LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, b, N_QUERIES), lambda i: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((num_chunks, gpc, N_QUERIES), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, N_QUERIES, b * pe.LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, b, N_QUERIES), jnp.int32),
        ]
        return pl.pallas_call(
            functools.partial(pe._stream_kernel, groups_per_chunk=gpc,
                              chunk_size=chunk, b=b, quant="none"),
            grid=(num_chunks,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            interpret=INTERPRET,
            **pe._compiler_params(INTERPRET, parallel=True),
        )(qs, c, valid_arr)

    def select_global(gmax_out):
        """Shipped selection: hier over [Q, 7813] + row-order argsort."""
        gmax = gmax_out.reshape(groups, N_QUERIES).T
        gvals, gsel = pe.hier_topk(gmax, TOPK)
        order = jnp.argsort(gsel, axis=-1)
        gsel = jnp.take_along_axis(gsel, order, axis=-1)
        gvals = jnp.take_along_axis(gvals, order, axis=-1)
        return gvals, gsel

    def make_asm():
        def run_one(qs, c):
            gmax_out, cand_out, gid_out = stream_pass(qs, c)
            gvals, gsel = select_global(gmax_out)
            gids = gid_out.transpose(2, 0, 1).reshape(N_QUERIES, cb)
            cand_all = cand_out.reshape(
                num_chunks, N_QUERIES, b, pe.LANES).transpose(
                1, 0, 2, 3).reshape(N_QUERIES, cb, pe.LANES)
            eq = gsel[:, :, None] == gids[:, None, :]
            cand = jax.lax.dot_general(
                eq.astype(jnp.float32), cand_all,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return cand.sum() + gvals.sum()
        return run_one, False

    def finalize(cand, gsel):
        return pe._final_select(cand, gsel, TOPK, N_CORPUS, N_QUERIES,
                                "hier", INTERPRET)

    def make_nofb():
        def run_one(qs, c):
            gmax_out, cand_out, gid_out = stream_pass(qs, c)
            gvals, gsel = select_global(gmax_out)
            gids = gid_out.transpose(2, 0, 1).reshape(N_QUERIES, cb)
            cand_all = cand_out.reshape(
                num_chunks, N_QUERIES, b, pe.LANES).transpose(
                1, 0, 2, 3).reshape(N_QUERIES, cb, pe.LANES)
            eq = gsel[:, :, None] == gids[:, None, :]
            cand = jax.lax.dot_general(
                eq.astype(jnp.float32), cand_all,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return finalize(cand, gsel)
        return run_one, True

    def einsum_assemble(eq, cand_out):
        # contraction over (chunk, slot) on the capture's native layout:
        # XLA fuses the [C,Q,B,L]->[Q,CB,L] transpose into the dot
        eq4 = eq.reshape(N_QUERIES, TOPK, num_chunks, b)
        cand4 = cand_out.reshape(num_chunks, N_QUERIES, b, pe.LANES)
        return jnp.einsum("qkcb,cqbl->qkl", eq4.astype(jnp.float32), cand4,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    def make_v_einsum():
        def run_one(qs, c):
            gmax_out, cand_out, gid_out = stream_pass(qs, c)
            gvals, gsel = select_global(gmax_out)
            gids = gid_out.transpose(2, 0, 1).reshape(N_QUERIES, cb)
            eq = gsel[:, :, None] == gids[:, None, :]
            cand = einsum_assemble(eq, cand_out)
            return finalize(cand, gsel)
        return run_one, True

    def make_v_capdom(flat_sel=False):
        def run_one(qs, c):
            gmax_out, cand_out, gid_out = stream_pass(qs, c)
            # capture maxima: [C, Q, b] -> [Q, C*b]
            capmax = jnp.max(cand_out.reshape(
                num_chunks, N_QUERIES, b, pe.LANES), axis=-1)
            capmax = capmax.transpose(1, 0, 2).reshape(N_QUERIES, cb)
            # padded-capture guard: FIN_MIN slots never selected above real
            if flat_sel:
                cvals, cpos = jax.lax.top_k(capmax, TOPK)
            else:
                cvals, cpos = pe.hier_topk(capmax, TOPK)
            gids = gid_out.transpose(2, 0, 1).reshape(N_QUERIES, cb)
            gsel = jnp.take_along_axis(gids, cpos, axis=-1)
            # residual: max gmax over NON-captured groups per chunk; exact
            # iff kth selected capture max >= that for every query
            gmax3 = gmax_out  # [C, gpc, Q]
            giota = jax.lax.broadcasted_iota(
                jnp.int32, (num_chunks, gpc, N_QUERIES), 1)
            rel = gid_out - (jnp.arange(num_chunks, dtype=jnp.int32)
                             [:, None, None] * gpc)      # [C, b, Q]
            capm = jnp.any(giota[:, :, None, :] == rel[:, None, :, :],
                           axis=2)                       # [C, gpc, Q]
            resid = jnp.max(jnp.where(capm, pe.FIN_MIN, gmax3),
                            axis=(0, 1))                 # [Q]
            ok = jnp.all(cvals[:, -1] >= resid)
            # row-order tie-break: sort selected groups ascending
            order = jnp.argsort(gsel, axis=-1)
            gsel = jnp.take_along_axis(gsel, order, axis=-1)
            cpos = jnp.take_along_axis(cpos, order, axis=-1)
            eq = cpos[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (N_QUERIES, TOPK, cb), 2)
            cand = einsum_assemble(eq, cand_out)
            vals, idx = finalize(cand, gsel)
            # fold the ok flag into validation: poison idx if check failed
            idx = jnp.where(ok, idx, -1)
            return vals, idx
        return run_one, True

    def time_config(label, cfg):
        run_one, validate = cfg

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(qs, c, rows, iters):
            def body(prev, _):
                p = jax.lax.optimization_barrier(prev)
                delta = (0.0 * p).astype(qs.dtype)
                out = run_one(qs + delta[None, None], c)
                if validate:
                    vals, idx = out
                    hits = jnp.sum((idx[:, 0] == rows).astype(jnp.int32))
                    return vals[0, 0], hits
                return out, out
            _, aux = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return aux

        try:
            windows = {}
            for n in SCAN_LENS:
                t0 = time.perf_counter()
                np.asarray(run(queries, corpus, rows_d, iters=n))
                print(f"{label} iters={n} compile+first "
                      f"{time.perf_counter() - t0:.0f}s",
                      file=sys.stderr, flush=True)
                reps = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    aux = np.asarray(run(queries, corpus, rows_d, iters=n))
                    reps.append(time.perf_counter() - t0)
                    if validate:
                        assert (aux > 0.99 * N_QUERIES).all(), aux
                windows[n] = min(reps)
            n0, n1 = SCAN_LENS
            per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
            rec = {"label": label, "smoke": SMOKE, "chunk": chunk, "b": b,
                   "ms_per_batch": round(per_iter * 1e3, 3),
                   "windows_ms": {str(k): round(v * 1e3, 1)
                                  for k, v in windows.items()}}
        except Exception as e:  # noqa: BLE001
            rec = {"label": label, "error": f"{type(e).__name__}: {e}"[:400]}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")

    time_config("nofb", make_nofb())
    time_config("asm", make_asm())
    time_config("v_einsum", make_v_einsum())
    time_config("v_capdom", make_v_capdom())
    time_config("v_capflat", make_v_capdom(flat_sel=True))


if __name__ == "__main__":
    main()
