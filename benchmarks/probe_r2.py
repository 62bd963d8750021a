"""Round-2 probe: where do the ~28ms of non-matmul time in exact MIPS go?

Each probe is run in its own process (the driver shell gives each a timeout,
since some program shapes have wedged the remote compiler before). Every timed
loop fetches and VALIDATES its outputs — unvalidated timings on this relay can
be silently wrong (see CLAUDE.md).

Usage: python benchmarks/probe_r2.py --probe NAME [--iters N]
Prints one JSON line on success.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

N = 1_000_000
D = 1024
Q = 256
K = 100
LANES = 128


def _data(q_rows=Q, seed=0):
    import jax
    import ml_dtypes

    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal((N, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    query_rows = rng.integers(0, N, size=q_rows)
    queries = corpus[query_rows].copy()
    c = jax.device_put(corpus.astype(ml_dtypes.bfloat16))
    qs = jax.device_put(queries.astype(ml_dtypes.bfloat16))
    c.block_until_ready()
    return qs, c, query_rows


def _time(fn, validate, iters):
    """Compile once, then time `iters` calls, fetching + validating each."""
    out = fn()
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    fetched = [jax.tree.map(np.asarray, o) for o in outs]
    dt = (time.perf_counter() - t0) / iters
    for f in fetched:
        validate(f)
    return dt


# ---------------------------------------------------------------- end-to-end

def probe_baseline_exact(iters):
    from kirag_tpu.ops.mips import topk_mips

    qs, c, rows = _data()
    fn = lambda: topk_mips(qs, c, K, chunk_size=262144)

    def val(o):
        assert float(np.mean(o[1][:, 0] == rows)) > 0.99

    dt = _time(fn, val, iters)
    return {"ms": dt * 1e3, "qps": Q / dt}


def _onehot_chunk_topk(scores, chunk_base, k):
    """Two-stage chunk top-k with the gathers replaced by arithmetic +
    a one-hot MXU matmul (take_along_axis on TPU is the suspected hot spot)."""
    import jax
    import jax.numpy as jnp

    q, c = scores.shape
    groups = c // LANES
    s3 = scores.reshape(q, groups, LANES)
    gmax = s3.max(-1)
    _, gidx = jax.lax.top_k(gmax, k)  # [Q, k] group ids, stable ties
    onehot = (gidx[:, :, None] == jnp.arange(groups, dtype=jnp.int32)[None, None, :]
              ).astype(scores.dtype)  # [Q, k, G]
    cand = jax.lax.dot_general(
        onehot, s3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [Q, k, LANES]
    cand = cand.reshape(q, k * LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, k, LANES), 2)
    cand_rows = (chunk_base + gidx[:, :, None] * LANES + lane).reshape(q, k * LANES)
    vals, pos = jax.lax.top_k(cand, k)
    return vals, jnp.take_along_axis(cand_rows, pos, axis=-1)


def _exact_onehot(queries, corpus, k, chunk_size):
    import jax
    import jax.numpy as jnp

    FIN_MIN = float(np.finfo(np.float32).min)
    q = queries.shape[0]
    n, d = corpus.shape
    num_chunks = n // chunk_size
    chunks = corpus.reshape(num_chunks, chunk_size, d)

    init_vals = jnp.full((q, k), FIN_MIN, dtype=jnp.float32)
    init_idx = jnp.zeros((q, k), dtype=jnp.int32)

    def step(carry, inp):
        run_vals, run_idx = carry
        chunk_i, chunk = inp
        scores = jax.lax.dot_general(
            queries, chunk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        new_vals, new_idx = _onehot_chunk_topk(scores, chunk_i * chunk_size, k)
        vals = jnp.concatenate([run_vals, new_vals], axis=-1)
        idx = jnp.concatenate([run_idx, new_idx], axis=-1)
        top_vals, pos = jax.lax.top_k(vals, k)
        return (top_vals, jnp.take_along_axis(idx, pos, axis=-1)), None

    (vals, idx), _ = jax.lax.scan(
        step, (init_vals, init_idx),
        (jnp.arange(num_chunks, dtype=jnp.int32), chunks))
    return vals, idx


def _probe_exact_onehot(iters, chunk, q_rows=Q):
    import jax

    qs, c, rows = _data(q_rows=q_rows)
    fn = jax.jit(functools.partial(_exact_onehot, k=K, chunk_size=chunk))

    def val(o):
        assert float(np.mean(o[1][:, 0] == rows)) > 0.99

    dt = _time(lambda: fn(qs, c), val, iters)
    return {"ms": dt * 1e3, "qps": q_rows / dt}


def probe_exact_onehot_262k(iters):
    return _probe_exact_onehot(iters, 262144)


def probe_exact_onehot_524k(iters):
    return _probe_exact_onehot(iters, 524288)


def probe_exact_onehot_1m(iters):
    return _probe_exact_onehot(iters, N)


def probe_exact_onehot_262k_q1024(iters):
    return _probe_exact_onehot(iters, 262144, q_rows=1024)


def probe_matmul_only(iters):
    """Floor: the scoring matmul alone (chunked scan, running max carry so all
    chunks contribute to a tiny validated output)."""
    import jax
    import jax.numpy as jnp

    qs, c, rows = _data()
    chunk = 262144
    chunks = c.reshape(N // chunk, chunk, D)

    @jax.jit
    def fn(queries, chunks):
        def step(carry, chunk):
            scores = jax.lax.dot_general(
                queries, chunk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.maximum(carry, scores.max(-1)), None

        init = jnp.full((queries.shape[0],), -jnp.inf, dtype=jnp.float32)
        out, _ = jax.lax.scan(step, init, chunks)
        return out

    def val(o):
        assert float(np.mean(o > 0.98)) > 0.99  # self-match IP ~ 1.0

    dt = _time(lambda: fn(qs, chunks), val, iters)
    return {"ms": dt * 1e3}


# ---------------------------------------------------------------- micro ops

def _micro(op, x_shape, validate, iters, n_inner=20, seed=0):
    """Time `op` over a batch of distinct inputs inside one jit (amortizes
    relay dispatch): scan over n_inner slices of a bigger random array."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    xs = jax.device_put(rng.standard_normal((n_inner,) + x_shape, dtype=np.float32))
    xs.block_until_ready()

    @jax.jit
    def fn(xs):
        def step(acc, x):
            return acc + op(x), None

        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), xs)
        return out

    dt = _time(lambda: fn(xs), validate, iters)
    return {"ms_per_op": dt * 1e3 / n_inner}


def probe_topk_2048(iters):
    import jax

    return _micro(lambda x: jax.lax.top_k(x, K)[0].sum(), (Q, 2048),
                  lambda o: np.isfinite(o).all(), iters)


def probe_topk_8192(iters):
    import jax

    return _micro(lambda x: jax.lax.top_k(x, K)[0].sum(), (Q, 8192),
                  lambda o: np.isfinite(o).all(), iters)


def probe_topk_12800(iters):
    import jax

    return _micro(lambda x: jax.lax.top_k(x, K)[0].sum(), (Q, 12800),
                  lambda o: np.isfinite(o).all(), iters)


def probe_gather_groups(iters):
    """take_along_axis of [Q,K,128] from [Q,2048,128] — v1's stage-2 gather."""
    import jax
    import jax.numpy as jnp

    def op(x):
        s3 = x.reshape(Q, 2048, LANES)
        gmax = s3.max(-1)
        _, gidx = jax.lax.top_k(gmax, K)
        cand = jnp.take_along_axis(s3, gidx[:, :, None], axis=1)
        return cand.sum()

    return _micro(op, (Q, 2048 * LANES), lambda o: np.isfinite(o).all(), iters,
                  n_inner=4)


def probe_onehot_gather(iters):
    """Same selection via one-hot MXU matmul."""
    import jax
    import jax.numpy as jnp

    def op(x):
        s3 = x.reshape(Q, 2048, LANES)
        gmax = s3.max(-1)
        _, gidx = jax.lax.top_k(gmax, K)
        onehot = (gidx[:, :, None] == jnp.arange(2048, dtype=jnp.int32)[None, None, :]
                  ).astype(x.dtype)
        cand = jax.lax.dot_general(
            onehot, s3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return cand.sum()

    return _micro(op, (Q, 2048 * LANES), lambda o: np.isfinite(o).all(), iters,
                  n_inner=4)


# ---------------------------------------------------------------- pallas

def _probe_pallas_gmax(iters, chunk):
    from kirag_tpu.ops.pallas_mips import approx_topk_mips

    qs, c, rows = _data()
    fn = lambda: approx_topk_mips(qs, c, K, chunk_size=chunk, interpret=False)

    def val(o):
        assert float(np.mean(o[1][:, 0] == rows)) > 0.99

    dt = _time(fn, val, iters)
    return {"ms": dt * 1e3, "qps": Q / dt}


def probe_pallas_gmax_2048(iters):
    return _probe_pallas_gmax(iters, 2048)


def probe_pallas_gmax_8192(iters):
    return _probe_pallas_gmax(iters, 8192)


def probe_pallas_gmax_32768(iters):
    return _probe_pallas_gmax(iters, 32768)


PROBES = {name[len("probe_"):]: fn for name, fn in list(globals().items())
          if name.startswith("probe_")}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probe", required=True, choices=sorted(PROBES))
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    t0 = time.perf_counter()
    try:
        res = PROBES[args.probe](args.iters)
        res.update(probe=args.probe, ok=True,
                   wall_s=round(time.perf_counter() - t0, 1))
    except Exception as e:  # noqa: BLE001 — must report, driver has a timeout
        res = {"probe": args.probe, "ok": False, "error": f"{type(e).__name__}: {e}",
               "wall_s": round(time.perf_counter() - t0, 1)}
    print(json.dumps(res))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
