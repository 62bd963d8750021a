"""Rounds 2-3 probe harness: where does exact-MIPS device time go?

(Named for the round that created it; round 3 added the scan-chained
`sc_*` probes — N chained iterations inside one jit, two scan lengths
min-of-3 differenced — which superseded the single-dispatch `ch_*` timers
once the ~8 ms/execute relay latency was identified. Results accumulate in
probe_r3_results.jsonl; the decisive findings are summarized in
docs/DESIGN.md §0c.)

Runs ALL probes in ONE process (the host->device corpus transfer costs ~20min
through the tunnel, so it must be paid once), each under a SIGALRM guard
(some program shapes have wedged the remote compiler before). Every timed
loop fetches and VALIDATES its outputs — unvalidated timings on this relay
can be silently wrong (see CLAUDE.md).

Usage: python benchmarks/probe_r2.py [--probes NAME ...] [--iters N]
Appends one JSON line per probe to benchmarks/probe_r2_results.jsonl.
"""

from __future__ import annotations

import argparse
import functools
import json
import signal
import sys
import time

import numpy as np

N = 1_000_000
D = 1024
Q = 256
K = 100
LANES = 128
FIN_MIN = float(np.finfo(np.float32).min)

_CACHE = {}


def _data(q_rows=Q):
    import jax
    import ml_dtypes

    if "corpus" not in _CACHE:
        rng = np.random.default_rng(0)
        corpus = rng.standard_normal((N, D), dtype=np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        c = jax.device_put(corpus.astype(ml_dtypes.bfloat16))
        c.block_until_ready()
        _CACHE["corpus"] = c
        _CACHE["corpus_host"] = corpus
        _CACHE["rng"] = rng
    if ("queries", q_rows) not in _CACHE:
        rng = np.random.default_rng(1)
        rows = rng.integers(0, N, size=q_rows)
        qs = jax.device_put(
            _CACHE["corpus_host"][rows].astype(ml_dtypes.bfloat16))
        qs.block_until_ready()
        _CACHE[("queries", q_rows)] = (qs, rows)
    qs, rows = _CACHE[("queries", q_rows)]
    return qs, _CACHE["corpus"], rows


def _time(fn, validate, iters):
    """Legacy timer: fetch every output INSIDE the window (matches round-1
    bench.py). Honest end-to-end, but today's relay adds ~100ms of link
    latency per fetch, drowning kernel-level differences."""
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    fetched = [jax.tree.map(np.asarray, o) for o in outs]
    dt = (time.perf_counter() - t0) / iters
    for f in fetched:
        validate(f)
    return dt


def _time_chained(fn_d, validate, iters, q_rows, dtype):
    """Relay-proof device timer for kernel A/B comparisons.

    Each iteration's input is perturbed by a ZERO delta computed from the
    previous iteration's output, so (a) no layer can dedup/reorder identical
    executions and (b) the device serializes all iterations; the FINAL
    output is fetched inside the window (block_until_ready alone has been
    observed not to block through this relay: probe exact_onepass_1m
    'ran' 5x537 GFLOP in 1ms). Remaining outputs are validated after.
    """
    import jax
    import jax.numpy as jnp

    zero = jnp.zeros((q_rows, 1), dtype=dtype)
    out = fn_d(zero)
    jax.block_until_ready(out)
    # warm the FULL chained step: the delta's eager ops (mul/slice/astype)
    # compile through the remote relay on first use — measured as a
    # multi-second penalty inside iteration 1 of every process's first probe
    out = fn_d((0.0 * out[0][:, :1]).astype(dtype))
    jax.block_until_ready(out)
    np.asarray(jax.tree.map(np.asarray, out))
    t0 = time.perf_counter()
    outs = []
    prev = out
    for _ in range(iters):
        delta = (0.0 * prev[0][:, :1]).astype(dtype)
        o = fn_d(delta)
        outs.append(o)
        prev = o
    final = jax.tree.map(np.asarray, outs[-1])
    dt = (time.perf_counter() - t0 - 0.0) / iters
    validate(final)
    for o in outs[:-1]:
        validate(jax.tree.map(np.asarray, o))
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


def _exact_onehot(queries, corpus, k, chunk_size, n_valid):
    import jax
    import jax.numpy as jnp

    q = queries.shape[0]
    n, d = corpus.shape
    num_chunks = -(-n // chunk_size)
    n_pad = num_chunks * chunk_size
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
    chunks = corpus.reshape(num_chunks, chunk_size, d)

    init_vals = jnp.full((q, k), FIN_MIN, dtype=jnp.float32)
    init_idx = jnp.zeros((q, k), dtype=jnp.int32)

    def step(carry, inp):
        run_vals, run_idx = carry
        chunk_i, chunk = inp
        scores = jax.lax.dot_general(
            queries, chunk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = chunk_i * chunk_size + jax.lax.broadcasted_iota(
            jnp.int32, (q, chunk_size), 1)
        # finite mask (not -inf): the one-hot matmul multiplies by 0
        scores = jnp.where(col < n_valid, scores, FIN_MIN)
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
    fn = jax.jit(functools.partial(_exact_onehot, k=K, chunk_size=chunk, n_valid=N))

    def val(o):
        assert float(np.mean(o[1][:, 0] == rows)) > 0.99

    dt = _time(lambda: fn(qs, c), val, iters)
    return {"ms": dt * 1e3, "qps": q_rows / dt}


def probe_exact_onehot_262k(iters):
    return _probe_exact_onehot(iters, 262144)


def probe_exact_onehot_524k(iters):
    return _probe_exact_onehot(iters, 524288)


def probe_exact_onehot_262k_q1024(iters):
    return _probe_exact_onehot(iters, 262144, q_rows=1024)


def probe_matmul_only(iters):
    """Floor: the scoring matmul alone (chunked scan, running max carry so all
    chunks contribute to a tiny validated output)."""
    import jax
    import jax.numpy as jnp

    qs, c, rows = _data()
    chunk = 250000
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


def probe_gmax_only(iters):
    """Isolate the [Q, G, 128] reshape + lane max-reduce."""
    import jax.numpy as jnp

    def op(x):
        return x.reshape(Q, 2048, LANES).max(-1).sum()

    return _micro(op, (Q, 2048 * LANES), lambda o: np.isfinite(o).all(), iters,
                  n_inner=4)


def probe_gather_only_fixed(iters):
    """Isolate take_along_axis with a FIXED index set (no gmax/topk)."""
    import jax.numpy as jnp

    idx = (np.arange(K, dtype=np.int32) * 17 % 2048)[None, :, None].repeat(Q, 0)

    def op(x):
        s3 = x.reshape(Q, 2048, LANES)
        return jnp.take_along_axis(s3, jnp.asarray(idx), axis=1).sum()

    return _micro(op, (Q, 2048 * LANES), lambda o: np.isfinite(o).all(), iters,
                  n_inner=4)


def probe_onehot_only_fixed(iters):
    """Isolate the one-hot einsum gather with a FIXED index set."""
    import jax
    import jax.numpy as jnp

    idx = (np.arange(K, dtype=np.int32) * 17 % 2048)[None, :].repeat(Q, 0)
    onehot_np = (idx[:, :, None] == np.arange(2048, dtype=np.int32)[None, None, :]
                 ).astype(np.float32)

    def op(x):
        s3 = x.reshape(Q, 2048, LANES)
        cand = jax.lax.dot_general(
            jnp.asarray(onehot_np), s3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
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


def _probe_exact_onepass(iters, q_rows=Q):
    from kirag_tpu.ops.mips import topk_mips_onepass

    qs, c, rows = _data(q_rows=q_rows)
    fn = lambda: topk_mips_onepass(qs, c, K)

    def val(o):
        assert float(np.mean(o[1][:, 0] == rows)) > 0.99

    dt = _time(fn, val, iters)
    return {"ms": dt * 1e3, "qps": q_rows / dt}


def probe_exact_onepass_1m(iters):
    return _probe_exact_onepass(iters)


def probe_exact_onepass_1m_q1024(iters):
    return _probe_exact_onepass(iters, q_rows=1024)


def probe_exact_onepass_1m_q64(iters):
    return _probe_exact_onepass(iters, q_rows=64)


def probe_tiny_dispatch(iters):
    """Round-trip latency of a tiny device program through the tunnel — the
    cost floor for moving the aligner's candidate rescoring (item 6 of the
    round-1 verdict) onto the device per turn."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    q = jax.device_put(rng.standard_normal((2, 1024), dtype=np.float32))
    d = jax.device_put(rng.standard_normal((1024, 1024), dtype=np.float32))

    @jax.jit
    def rank(q, d):
        scores = q @ d.T
        return jax.lax.top_k(scores, 20)

    dt = _time(lambda: rank(q, d), lambda o: np.isfinite(o[0]).all(), iters * 4)
    return {"ms_per_op": dt * 1e3}


# ---------------------------------------------------------------- pallas

def _probe_exact_pallas(iters, chunk, q_rows=Q):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    qs, c, rows = _data(q_rows=q_rows)
    fn = lambda: exact_topk_mips(qs, c, K, chunk_size=chunk, interpret=False)

    def val(o):
        assert float(np.mean(o[1][:, 0] == rows)) > 0.99

    dt = _time(fn, val, iters)
    return {"ms": dt * 1e3, "qps": q_rows / dt}


def probe_exact_pallas_c4096(iters):
    return _probe_exact_pallas(iters, 4096)


def probe_exact_pallas_c8192(iters):
    return _probe_exact_pallas(iters, 8192)


def probe_exact_pallas_c16384(iters):
    return _probe_exact_pallas(iters, 16384)


def probe_exact_pallas_c32768(iters):
    return _probe_exact_pallas(iters, 32768)


def probe_exact_pallas_c8192_q1024(iters):
    return _probe_exact_pallas(iters, 8192, q_rows=1024)


def _probe_topk_lastdim(iters, w):
    """lax.top_k at the exact-path widths. (The Pallas iterative variant
    these probes measured 2.5-3.6x slower was removed in round 4 — the
    recorded probe_r2b numbers are its tombstone.)"""
    import jax

    from kirag_tpu.ops.pallas_exact import topk_lastdim

    rng = np.random.default_rng(3)
    x = jax.device_put(rng.standard_normal((Q, w), dtype=np.float32))
    x.block_until_ready()
    ref = np.argsort(-np.asarray(x), axis=-1, kind="stable")[:, :K]
    fn = lambda: topk_lastdim(x, K, interpret=False)

    def val(o):
        assert np.array_equal(o[1], ref)

    dt = _time(fn, val, iters)
    return {"ms_per_op": dt * 1e3}


def probe_topk_lax_12800(iters):
    return _probe_topk_lastdim(iters, 12800)


# ------------------------------------------------------- chained A/B probes

def _probe_chained(iters, call, q_rows=Q):
    qs, c, rows = _data(q_rows=q_rows)

    def val(o):
        assert float(np.mean(o[1][:, 0] == rows)) > 0.99

    dt = _time_chained(lambda d: call(qs + d, c), val, iters, q_rows, qs.dtype)
    return {"ms": dt * 1e3, "qps": q_rows / dt}


def probe_ch_exact_scan(iters):
    from kirag_tpu.ops.mips import topk_mips

    return _probe_chained(iters, lambda q, c: topk_mips(q, c, K, chunk_size=262144))


def probe_ch_exact_onepass(iters):
    from kirag_tpu.ops.mips import topk_mips_onepass

    return _probe_chained(iters, lambda q, c: topk_mips_onepass(q, c, K))


def probe_ch_exact_pallas_c8192(iters):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    return _probe_chained(
        iters, lambda q, c: exact_topk_mips(q, c, K, chunk_size=8192,
                                            interpret=False))


def probe_ch_exact_pallas_c16384(iters):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    return _probe_chained(
        iters, lambda q, c: exact_topk_mips(q, c, K, chunk_size=16384,
                                            interpret=False))


def probe_ch_exact_pallas_c32768(iters):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    return _probe_chained(
        iters, lambda q, c: exact_topk_mips(q, c, K, chunk_size=32768,
                                            interpret=False))


def probe_ch_exact_pallas_hier_c16384(iters):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    return _probe_chained(
        iters, lambda q, c: exact_topk_mips(q, c, K, chunk_size=16384,
                                            interpret=False, select="hier"))


def probe_ch_exact_pallas_hier_c8192(iters):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    return _probe_chained(
        iters, lambda q, c: exact_topk_mips(q, c, K, chunk_size=8192,
                                            interpret=False, select="hier"))


def probe_ch_approx_pallas(iters):
    from kirag_tpu.ops.pallas_mips import approx_topk_mips

    return _probe_chained(
        iters, lambda q, c: approx_topk_mips(q, c, K, chunk_size=8192,
                                             interpret=False))


def probe_ch_gmax_only_c8192(iters):
    """Pass A alone: the fused scoring+group-max kernel (with argmax)."""
    from kirag_tpu.ops.pallas_mips import grouped_max_scores

    qs, c, rows = _data()
    n_pad = -(-N // 8192) * 8192
    import jax.numpy as jnp

    c_pad = jnp.pad(c, ((0, n_pad - N), (0, 0)))

    def val(o):
        gmax = o[0][:, 0]  # [Q, W, G] since the winners-per-group knob
        own_group = rows // 128
        assert float(np.mean(
            gmax[np.arange(Q), own_group] > 0.97)) > 0.99

    dt = _time_chained(
        lambda d: grouped_max_scores(qs + d, c_pad, chunk_size=8192,
                                     interpret=False),
        val, iters, Q, qs.dtype)
    return {"ms": dt * 1e3}


def _probe_ch_topk(iters, fn_name):
    """Group-selection stage alone on a realistic [Q, 7936] f32 input."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x_host = rng.standard_normal((Q, 7936), dtype=np.float32)
    ref = np.argsort(-x_host, axis=-1, kind="stable")[:, :K]
    x = jax.device_put(x_host)
    x.block_until_ready()

    if fn_name == "topk":
        f = jax.jit(lambda y: jax.lax.top_k(y, K))

        def val(o):
            assert np.array_equal(o[1], ref)
    else:
        f = jax.jit(lambda y: jax.lax.approx_max_k(
            y, K, recall_target=0.99, aggregate_to_topk=True))

        def val(o):
            rec = np.mean([len(set(o[1][i]) & set(ref[i])) / K
                           for i in range(Q)])
            assert rec > 0.95, rec

    def fn_d(d):
        return f(x + d)

    dt = _time_chained(fn_d, val, iters, Q, jnp.float32)
    return {"ms": dt * 1e3}


def probe_ch_topk_7936(iters):
    return _probe_ch_topk(iters, "topk")


def probe_ch_approxmaxk_7936(iters):
    return _probe_ch_topk(iters, "approx_max_k")


def _probe_ch_approxmaxk_exact(iters, w):
    """approx_max_k with recall_target=1.0: is it EXACT (values, indices,
    lower-index tie-break) and how fast vs lax.top_k?"""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x_host = rng.standard_normal((Q, w), dtype=np.float32)
    x_host[7, :] = 2.5          # full-row tie: indices must be 0..K-1
    x_host[11, 100] = x_host[11, 900] = 7.0   # pairwise tie across segments
    ref = np.argsort(-x_host, axis=-1, kind="stable")[:, :K]
    x = jax.device_put(x_host)
    x.block_until_ready()
    f = jax.jit(lambda y: jax.lax.approx_max_k(
        y, K, recall_target=1.0, aggregate_to_topk=True))

    def val(o):
        vals_ok = np.allclose(o[0], np.take_along_axis(x_host, ref, -1))
        idx_match = float(np.mean(o[1] == ref))
        assert vals_ok, "values differ from exact"
        assert idx_match == 1.0, f"index/tie mismatch rate {1-idx_match}"

    dt = _time_chained(lambda d: f(x + d), val, iters, Q, jnp.float32)
    return {"ms": dt * 1e3}


def probe_ch_approxmaxk_exact_7936(iters):
    return _probe_ch_approxmaxk_exact(iters, 7936)


def probe_ch_approxmaxk_exact_12800(iters):
    return _probe_ch_approxmaxk_exact(iters, 12800)


def probe_ch_exact_pallas_c16384_q1024(iters):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    return _probe_chained(
        iters, lambda q, c: exact_topk_mips(q, c, K, chunk_size=16384,
                                            interpret=False), q_rows=1024)


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


# ------------------------------------------------------- round-3 probes
# The single-read kernel (impl="single"): one corpus read, scores to HBM,
# candidates gathered from the score matrix; select="hier" replaces the
# wide lax.top_k sorts (11.7ms at [256, 7936]) with two narrow ones.


def _probe_ch_single(iters, chunk, select="flat", q_rows=Q):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    return _probe_chained(
        iters, lambda q, c: exact_topk_mips(q, c, K, chunk_size=chunk,
                                            interpret=False, select=select,
                                            impl="single"), q_rows=q_rows)


def probe_ch_exact_single_c8192(iters):
    return _probe_ch_single(iters, 8192)


def probe_ch_exact_single_c16384(iters):
    return _probe_ch_single(iters, 16384)


def probe_ch_exact_single_hier_c8192(iters):
    return _probe_ch_single(iters, 8192, select="hier")


def probe_ch_exact_single_hier_c16384(iters):
    return _probe_ch_single(iters, 16384, select="hier")


def probe_ch_exact_single_hier_c8192_q1024(iters):
    return _probe_ch_single(iters, 8192, select="hier", q_rows=1024)


def probe_ch_hier_7936(iters):
    """hier_topk alone at the group-selection width (vs ch_topk_7936=11.7ms)."""
    import jax

    from kirag_tpu.ops.pallas_exact import hier_topk

    rng = np.random.default_rng(5)
    x_host = rng.standard_normal((Q, 7936), dtype=np.float32)
    ref = np.argsort(-x_host, axis=-1, kind="stable")[:, :K]
    x = jax.device_put(x_host)
    x.block_until_ready()
    f = jax.jit(lambda y: hier_topk(y, K))

    def val(o):
        assert np.array_equal(o[1], ref)

    import jax.numpy as jnp

    dt = _time_chained(lambda d: f(x + d), val, iters, Q, jnp.float32)
    return {"ms": dt * 1e3}


# --------------------------------------------- round-3 scan-chained probes
# One jit program runs ITERS chained kernel iterations via lax.scan (true
# data dependency through the carry), returning the LAST full output plus
# device-computed per-iteration self-hit counts. Timing two scan lengths and
# differencing cancels the constant dispatch+fetch overhead exactly — the
# per-execute relay latency (~8ms) that inflates every single-dispatch
# chained number on this rig.


def _probe_scan_pair(call, q_rows=Q, lens=(8, 32)):
    import functools

    import jax
    import jax.numpy as jnp

    qs, c, rows = _data(q_rows=q_rows)
    rows_d = jax.device_put(jnp.asarray(rows, dtype=jnp.int32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(qs, c, rows_d, iters):
        def body(prev_vals, _):
            delta = (0.0 * prev_vals[:, :1]).astype(qs.dtype)
            vals, idx = call(qs + delta, c)
            hits = jnp.sum((idx[:, 0] == rows_d).astype(jnp.int32))
            return vals, hits

        init = jnp.zeros((q_rows, K), dtype=jnp.float32)
        last_vals, hits = jax.lax.scan(body, init, None, length=iters)
        return last_vals, hits

    windows = {}
    for n in lens:
        out = run(qs, c, rows_d, iters=n)       # warm/compile
        jax.tree.map(np.asarray, out)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            vals, hits = run(qs, c, rows_d, iters=n)
            hits_h = np.asarray(hits)           # fetch inside window
            vals_h = np.asarray(vals)
            reps.append(time.perf_counter() - t0)
            assert (hits_h > 0.99 * q_rows).all(), hits_h
            assert np.isfinite(vals_h).all()
        # min over reps: a relay hiccup inside one window otherwise gets
        # billed to the kernel by the differencing
        windows[n] = min(reps)
    n0, n1 = lens
    per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
    return {"ms": per_iter * 1e3, "qps": q_rows / per_iter,
            "window_ms": {str(n): round(w * 1e3, 1)
                          for n, w in windows.items()}}


def _scan_exact(chunk, select, impl):
    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    return lambda q, c: exact_topk_mips(q, c, K, chunk_size=chunk,
                                        interpret=False, select=select,
                                        impl=impl)


def probe_sc_single_flat_c8192(iters):
    return _probe_scan_pair(_scan_exact(8192, "flat", "single"))


def probe_sc_singlec_hier_c8192(iters):
    """Chunk-contiguous score layout (now impl=\"single\"; the strided
    variant lives on as impl=\"single_strided\")."""
    return _probe_scan_pair(_scan_exact(8192, "hier", "single"))


def probe_sc_singlec_hier_c16384(iters):
    return _probe_scan_pair(_scan_exact(16384, "hier", "single"))


def probe_sc_singlestrided_hier_c8192(iters):
    return _probe_scan_pair(_scan_exact(8192, "hier", "single_strided"))


def probe_sc_par_hier_c8192(iters):
    """Same program as sc_singlec_hier_c8192 built with parallel grid
    semantics on the fused pass (A/B: does Mosaic overlap chunk DMA with
    compute better when the grid dim is declared dependency-free?)."""
    return _probe_scan_pair(_scan_exact(8192, "hier", "single"))


def probe_sc_par_passA_c8192(iters):
    return probe_sc_passA_single_c8192(iters)


def probe_sc_prepad_hier_c8192(iters):
    """Corpus PRE-PADDED to the chunk grid + valid_rows: removes the in-jit
    jnp.pad (a full corpus read+write per call at 1M x 1024)."""
    import jax
    import jax.numpy as jnp

    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    qs, c, rows = _data()
    n_pad = -(-N // 8192) * 8192
    c_pad = jnp.pad(c, ((0, n_pad - N), (0, 0)))
    c_pad.block_until_ready()
    rows_d = jax.device_put(jnp.asarray(rows, dtype=jnp.int32))
    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(qs, c, rows_arr, iters):
        def body(prev_vals, _):
            delta = (0.0 * prev_vals[:, :1]).astype(qs.dtype)
            vals, idx = exact_topk_mips(qs + delta, c, K, chunk_size=8192,
                                        valid_rows=N, interpret=False,
                                        select="hier", impl="single")
            hits = jnp.sum((idx[:, 0] == rows_arr).astype(jnp.int32))
            return vals, hits

        init = jnp.zeros((Q, K), dtype=jnp.float32)
        return jax.lax.scan(body, init, None, length=iters)

    windows = {}
    for n in (8, 32):
        out = run(qs, c_pad, rows_d, iters=n)
        jax.tree.map(np.asarray, out)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            vals, hits = run(qs, c_pad, rows_d, iters=n)
            hits_h = np.asarray(hits)
            np.asarray(vals)
            reps.append(time.perf_counter() - t0)
            assert (hits_h > 0.99 * Q).all(), hits_h
        windows[n] = min(reps)
    per_iter = (windows[32] - windows[8]) / 24
    return {"ms": per_iter * 1e3, "qps": Q / per_iter,
            "window_ms": {str(n): round(w * 1e3, 1)
                          for n, w in windows.items()}}


def probe_sc_prepad_approx_c8192(iters):
    """Approx mode with the pre-padded corpus (same advantage the indexer
    now gives every mode): the in-jit pad cost ~5.8 ms/call at 1M x 1024."""
    import functools

    import jax
    import jax.numpy as jnp

    from kirag_tpu.ops.pallas_mips import approx_topk_mips

    qs, c, rows = _data()
    n_pad = -(-N // 8192) * 8192
    c_pad = jnp.pad(c, ((0, n_pad - N), (0, 0)))
    c_pad.block_until_ready()
    rows_d = jax.device_put(jnp.asarray(rows, dtype=jnp.int32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(qs, c, rows_arr, iters):
        def body(prev_vals, _):
            delta = (0.0 * prev_vals[:, :1]).astype(qs.dtype)
            vals, idx = approx_topk_mips(qs + delta, c, K, chunk_size=8192,
                                         valid_rows=N, interpret=False)
            hits = jnp.sum((idx[:, 0] == rows_arr).astype(jnp.int32))
            return vals, hits

        init = jnp.zeros((Q, K), dtype=jnp.float32)
        return jax.lax.scan(body, init, None, length=iters)

    windows = {}
    for n in (8, 32):
        out = run(qs, c_pad, rows_d, iters=n)
        jax.tree.map(np.asarray, out)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            vals, hits = run(qs, c_pad, rows_d, iters=n)
            hits_h = np.asarray(hits)
            np.asarray(vals)
            reps.append(time.perf_counter() - t0)
            assert (hits_h > 0.99 * Q).all(), hits_h
        windows[n] = min(reps)
    per_iter = (windows[32] - windows[8]) / 24
    return {"ms": per_iter * 1e3, "qps": Q / per_iter,
            "window_ms": {str(n): round(w * 1e3, 1)
                          for n, w in windows.items()}}


def probe_sc_par_approx_c8192(iters):
    from kirag_tpu.ops.pallas_mips import approx_topk_mips

    return _probe_scan_pair(
        lambda q, c: approx_topk_mips(q, c, K, chunk_size=8192,
                                      interpret=False))


def probe_sc_single_hier_c8192(iters):
    return _probe_scan_pair(_scan_exact(8192, "hier", "single"))


def probe_sc_single_hier_c16384(iters):
    return _probe_scan_pair(_scan_exact(16384, "hier", "single"))


def probe_sc_twopass_hier_c16384(iters):
    return _probe_scan_pair(_scan_exact(16384, "hier", "twopass"))


def probe_sc_twopass_flat_c16384(iters):
    return _probe_scan_pair(_scan_exact(16384, "flat", "twopass"))


def probe_sc_approx_c8192(iters):
    from kirag_tpu.ops.pallas_mips import approx_topk_mips

    return _probe_scan_pair(
        lambda q, c: approx_topk_mips(q, c, K, chunk_size=8192,
                                      interpret=False))


def probe_sc_passA_single_c8192(iters):
    """The single-read fused pass ALONE (score write + gmax), scan-chained:
    isolates the kernel cost from the selection stages."""
    import functools

    import jax
    import jax.numpy as jnp

    from kirag_tpu.ops.pallas_exact import _exact_body

    qs, c, rows = _data()
    rows_d = jax.device_put(jnp.asarray(rows // LANES, dtype=jnp.int32))

    n_pad = -(-N // 8192) * 8192
    c_pad = jnp.pad(c, ((0, n_pad - N), (0, 0)))

    def passA(q_in, corpus):
        # k=1 keeps selection negligible; still runs the full fused pass
        return _exact_body(q_in, corpus, 1, 8192, N, False, None,
                           select="flat", impl="single")

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(qs, c, own_group, iters):
        def body(prev_vals, _):
            delta = (0.0 * prev_vals[:, :1]).astype(qs.dtype)
            vals, idx = passA(qs + delta, c)
            hits = jnp.sum((idx[:, 0] // LANES == own_group).astype(jnp.int32))
            return vals, hits

        init = jnp.zeros((Q, 1), dtype=jnp.float32)
        return jax.lax.scan(body, init, None, length=iters)

    windows = {}
    for n in (8, 32):
        out = run(qs, c_pad, rows_d, iters=n)
        jax.tree.map(np.asarray, out)
        t0 = time.perf_counter()
        vals, hits = run(qs, c_pad, rows_d, iters=n)
        hits_h = np.asarray(hits)
        np.asarray(vals)
        windows[n] = time.perf_counter() - t0
        assert (hits_h > 0.98 * Q).all(), hits_h
    per_iter = (windows[32] - windows[8]) / 24
    return {"ms": per_iter * 1e3,
            "window_ms": {str(n): round(w * 1e3, 1)
                          for n, w in windows.items()}}


# ------------------------------------- round-3 selection-stage micro probes
# Scan-chained micros at the EXACT shapes/layouts the single-read pipeline
# produces, to attribute the ~8ms of post-kernel time (full 16.1ms minus
# pass A 7.9ms).


def _probe_sc_micro(make_op, in_shape, iters_lens=(8, 64), seed=9):
    import functools

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = jax.device_put(rng.standard_normal(in_shape, dtype=np.float32))
    x.block_until_ready()
    op = make_op()

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, iters):
        def body(carry, _):
            y = op(x + carry)
            s = jnp.sum(y).astype(jnp.float32)
            return 0.0 * s, s

        _, sums = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return sums

    windows = {}
    for n in iters_lens:
        out = run(x, iters=n)
        np.asarray(out)
        t0 = time.perf_counter()
        out = run(x, iters=n)
        s = np.asarray(out)
        windows[n] = time.perf_counter() - t0
        assert np.isfinite(s).all()
    n0, n1 = iters_lens
    return {"ms": (windows[n1] - windows[n0]) / (n1 - n0) * 1e3,
            "window_ms": {str(n): round(w * 1e3, 1)
                          for n, w in windows.items()}}


def probe_sc_m_transpose(iters):
    """gmax layout fix-up: [C, gpc, Q] -> [Q, C*gpc] transpose (8 MB)."""
    return _probe_sc_micro(
        lambda: (lambda g: g.reshape(123 * 64, Q).T.sum(axis=1)),
        (123, 64, Q))


def probe_sc_m_hier7872(iters):
    from kirag_tpu.ops.pallas_exact import hier_topk

    return _probe_sc_micro(
        lambda: (lambda x: hier_topk(x, K)[0]), (Q, 7872))


def probe_sc_m_topk7872(iters):
    import jax

    return _probe_sc_micro(
        lambda: (lambda x: jax.lax.top_k(x, K)[0]), (Q, 7872))


def probe_sc_m_hier12800(iters):
    from kirag_tpu.ops.pallas_exact import hier_topk

    return _probe_sc_micro(
        lambda: (lambda x: hier_topk(x, K)[0]), (Q, 12800))


def probe_sc_m_scoregather(iters):
    """Candidate gather from chunk-contiguous scores: [Q,k,128] out of
    [123, Q, 64, 128] via advanced indexing (the single-impl layout)."""
    import jax
    import jax.numpy as jnp

    def make():
        rng = np.random.default_rng(3)
        gsel = jnp.asarray(
            np.sort(np.stack([rng.choice(123 * 64, size=K, replace=False)
                              for _ in range(Q)]), axis=-1), dtype=jnp.int32)

        def op(s):
            s4 = s.reshape(123, Q, 64, LANES)
            cid = gsel // 64
            wid = gsel % 64
            qix = jax.lax.broadcasted_iota(jnp.int32, gsel.shape, 0)
            return s4[cid, qix, wid].sum(axis=-1)

        return op

    return _probe_sc_micro(make, (123, Q, 64 * LANES), iters_lens=(8, 32))


PROBES = {name[len("probe_"):]: fn for name, fn in list(globals().items())
          if name.startswith("probe_")}

DEFAULT_ORDER = [
    "baseline_exact", "exact_onehot_262k", "matmul_only",
    "topk_12800", "topk_8192", "topk_2048",
    "gather_groups", "onehot_gather",
    "exact_onehot_524k", "pallas_gmax_8192", "pallas_gmax_32768",
    "exact_onehot_262k_q1024",
]


class _Timeout(Exception):
    pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probes", nargs="*", default=DEFAULT_ORDER)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--timeout", type=int, default=1500)
    p.add_argument("--out", default="benchmarks/probe_r2_results.jsonl")
    args = p.parse_args()

    def on_alarm(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, on_alarm)

    for name in args.probes:
        t0 = time.perf_counter()
        signal.alarm(args.timeout)
        try:
            res = PROBES[name](args.iters)
            res.update(probe=name, ok=True)
        except _Timeout:
            res = {"probe": name, "ok": False, "error": "timeout"}
        except Exception as e:  # noqa: BLE001 — keep the suite going
            res = {"probe": name, "ok": False,
                   "error": f"{type(e).__name__}: {e}"}
        finally:
            signal.alarm(0)
        res["wall_s"] = round(time.perf_counter() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(json.dumps(res))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
