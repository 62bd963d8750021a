"""probe_r6: int4 weight-matmul formulations at decode geometry (1 chip).

The r4 chip rows showed weight-only int4 decode SLOWER than int8 (8B: 37.8 vs
11.5 ms/step; 1.1B: 3.58 vs 1.69) — XLA materializes the blockwise dequant
instead of fusing it into the matmul operand, so the int4 path pays packed
read + full bf16 kernel write + re-read. This probe times a dense-stack
decode proxy (8 layers of [4096 -> 14336] + [14336 -> 4096], batch 4 — the
MLP of a Llama-3-8B slice, 0.94B params) per formulation:

  v_int8     : the shipped int8 path (per-out-channel scale; the fusion
               reference point)
  v_parity   : the shipped int4 path (nibble-parity split, scale on operand)
  v_blockdot : int4 as nb batched dots on raw nibbles + f32 scale on the
               [nb, B, out] PARTIAL products (the exact-search kernel's int4
               trick, in XLA — scale never touches the big tensor)
  v_pallas   : ops/pallas_qmm.int4_matmul — in-VMEM nibble dequant, HBM
               traffic = packed bytes only (speed-of-light for 4-bit)

Scan-pair differenced timing (two lax.scan lengths x 3 reps, min-diff; see
CLAUDE.md). Each row reports achieved GB/s over the formulation's ideal HBM
bytes (packed+scales for int4, int8+scales for int8). SMOKE=1 shrinks shapes
for a CPU interpret run (rows tagged; numbers meaningless off-chip).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("SMOKE", "0") == "1"
HIDDEN = 512 if SMOKE else 4096   # smoke half=256 keeps pallas tiling legal
FFN = 1024 if SMOKE else 14336
LAYERS = 2 if SMOKE else 8
BATCH = 4
LENS = (2, 4) if SMOKE else (8, 32)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r6_results.jsonl")


def main() -> None:
    import jax

    if SMOKE:  # keep smoke runs OFF the (single-tenant) chip; env var alone
        # is ignored — the host sitecustomize pins the platform (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kirag_tpu.models import llm
    from kirag_tpu.ops import pallas_qmm

    rng = np.random.default_rng(0)

    layers = []
    int4_bytes = 0
    int8_bytes = 0
    for _ in range(LAYERS):
        pair = []
        for (i, o) in [(HIDDEN, FFN), (FFN, HIDDEN)]:
            k = (rng.standard_normal((i, o), dtype=np.float32)
                 * (0.5 / np.sqrt(i)))
            q4 = llm._quantize_kernel_int4(k)
            q8 = llm._quantize_kernel_int8(k)
            pair.append({
                "q4": jax.device_put(q4["kernel_q4"]),
                "s4": jax.device_put(q4["kernel_scale4"]),
                "q8": jax.device_put(q8["kernel_q"]),
                "s8": jax.device_put(q8["kernel_scale"]),
            })
            int4_bytes += i * o // 2 + (i // llm.INT4_BLOCK) * o * 4
            int8_bytes += i * o + o * 4
        layers.append(pair)
        print(f"layer {len(layers)}/{LAYERS} quantized", file=sys.stderr,
              flush=True)
    jax.block_until_ready(layers)

    x0 = jnp.asarray(rng.standard_normal((BATCH, HIDDEN), dtype=np.float32)
                     ).astype(jnp.bfloat16)

    def mm_int8(x, p):
        kernel = p["q8"].astype(x.dtype) * p["s8"].astype(x.dtype)[None, :]
        return jnp.dot(x, kernel, preferred_element_type=x.dtype)

    def mm_parity(x, p):
        return llm._dense(x, {"kernel_q4": p["q4"], "kernel_scale4": p["s4"]})

    def mm_blockdot(x, p):
        pk = p["q4"].astype(jnp.int8)
        lo = (jnp.left_shift(pk, 4) >> 4).astype(x.dtype)
        hi = (pk >> 4).astype(x.dtype)
        half, out_dim = pk.shape
        scale = p["s4"].astype(jnp.float32)                 # [nb, out]
        nb = scale.shape[0]
        sub = half // nb
        lo3 = lo.reshape(nb, sub, out_dim)
        hi3 = hi.reshape(nb, sub, out_dim)
        xe = x[:, 0::2].reshape(x.shape[0], nb, sub)
        xo = x[:, 1::2].reshape(x.shape[0], nb, sub)
        dn = (((2,), (1,)), ((1,), (0,)))                   # batch over nb
        part = jax.lax.dot_general(xe, lo3, dn,
                                   preferred_element_type=jnp.float32)
        part = part + jax.lax.dot_general(xo, hi3, dn,
                                          preferred_element_type=jnp.float32)
        return jnp.sum(part * scale[:, None, :], axis=0).astype(x.dtype)

    def mm_pallas(x, p):
        return pallas_qmm.int4_matmul(x, p["q4"], p["s4"], interpret=SMOKE)

    def stack(mm):
        # params must be an ARGUMENT of the jitted fn: closing over ~0.5-1 GB
        # of device arrays bakes them into the lowered HLO as constants, and
        # the remote-compile relay rejects the request body (HTTP 413).
        def fwd(x, params):
            for pair in params:
                h = mm(x, pair[0])
                h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
                x = mm(h, pair[1])
                # renormalize so 2*LAYERS matmuls don't overflow bf16
                x = (x.astype(jnp.float32)
                     / (jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                        keepdims=True) + 1.0)
                     * np.sqrt(HIDDEN)).astype(jnp.bfloat16)
            return x
        return fwd

    def run_pair(mm):
        fwd = stack(mm)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(x, params, iters):
            def body(carry, _):
                c = jax.lax.optimization_barrier(carry)
                return fwd(c, params), jnp.sum(c.astype(jnp.float32))
            return jax.lax.scan(body, x, None, length=iters)

        windows = {}
        for n in LENS:
            out = run(x0, layers, iters=n)
            jax.tree.map(np.asarray, out)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                last, sums = run(x0, layers, iters=n)
                s = np.asarray(sums)
                np.asarray(last)
                reps.append(time.perf_counter() - t0)
                assert np.isfinite(s).all(), s
            windows[n] = min(reps)
        n0, n1 = LENS
        per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
        return per_iter, windows

    variants = [("v_int8", mm_int8, int8_bytes),
                ("v_parity", mm_parity, int4_bytes),
                ("v_blockdot", mm_blockdot, int4_bytes),
                ("v_pallas", mm_pallas, int4_bytes)]
    sel = os.environ.get("PROBE_VARIANTS")
    if sel:
        names = [s.strip() for s in sel.split(",")]
        variants = [v for v in variants if v[0] in names]

    for name, mm, ideal_bytes in variants:
        print(f"--- {name}", file=sys.stderr, flush=True)
        try:
            per_iter, windows = run_pair(mm)
            rec = {"probe": name, "hidden": HIDDEN, "ffn": FFN,
                   "layers": LAYERS, "batch": BATCH,
                   "ms": round(per_iter * 1e3, 3),
                   "ideal_gb": round(ideal_bytes / 1e9, 3),
                   "achieved_gbps": round(ideal_bytes / per_iter / 1e9, 1)
                   if per_iter > 0 else -1.0,
                   "window_ms": {str(n): round(w * 1e3, 1)
                                 for n, w in windows.items()}}
        except Exception as e:  # noqa: BLE001 - record and continue
            rec = {"probe": name, "error": str(e).split("\n")[0][:300]}
        if SMOKE:
            rec["smoke"] = True
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
