"""KiRAG loop with speculative decoding at MEASURED acceptance (VERDICT r4 #7).

Random-init weights have noise-level argmax agreement, so a real 160M draft
would accept ~nothing here — useless for economics that depend on acceptance.
Instead the draft's PROPOSALS are scripted (models.speculative draft_script):
the draft model still runs every step (real cost), but proposes the target's
own recorded greedy token, flipped to a guaranteed-wrong token at rate 1-p.
Acceptance is then exactly p per proposal while every byte of draft/verify
work is real — the measured speedup at acceptance p, not an assumed one.

Phases:
  A (baseline + record): plain greedy backend; `backend.greedy` is wrapped to
    record each ROW's output stream keyed by the digest of its unpadded
    prompt ids. The steady run is the baseline questions/hour.
  B (spec, per p): attach a ~160M random-init draft (bench_spec_decode's
    draft geometry) to the same backend; draft_script_fn replays the
    recorded stream with flips at rate 1-p. The wrapper now ASSERTS the
    emitted stream equals the recording row-for-row — the greedy
    bit-identity promise checked on chip at production geometry.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_spec_loop.py
Env: BENCH_SPEC_ACCEPT="0.9,0.75,0.5"  BENCH_GAMMA=4  BENCH_NQ=8  SMOKE=1
Appends JSON lines to benchmarks/bench_spec_loop_results.jsonl.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("SMOKE", "0") == "1"
N_QUESTIONS = int(os.environ.get("BENCH_NQ", 4 if SMOKE else 8))
GAMMA = int(os.environ.get("BENCH_GAMMA", 4))
ACCEPTS = tuple(float(x) for x in
                os.environ.get("BENCH_SPEC_ACCEPT", "0.9,0.75,0.5").split(","))
OUT = "benchmarks/bench_spec_loop_results.jsonl"

QUESTIONS = [
    "what is the w17 of the w42 title",
    "which w9 is the w133 of w60",
    "who w25 the w71 of the w8 title",
    "what w3 does the w150 w66 belong to",
    "which w12 title has the w99 of w47",
    "what is the w81 w5 of the w123 title",
    "who is the w33 behind the w102 w58",
    "which w7 w140 matches the w19 title",
]
for _i in range(len(QUESTIONS), N_QUESTIONS):
    QUESTIONS.append(f"what is the w{20 + 3 * _i} of the w{50 + 7 * _i} title")


def _reset(kirag):
    kirag.kg_generator.cached_kg_triples = {}
    kirag._triple_emb_cache.clear()


def _row_keys(input_ids, attention_mask):
    keys = []
    for r_ids, r_m in zip(np.asarray(input_ids), np.asarray(attention_mask)):
        row = np.asarray(r_ids)[np.asarray(r_m).astype(bool)].astype(np.int32)
        keys.append(hashlib.md5(row.tobytes()).hexdigest())
    return keys


def main() -> None:
    assert not os.environ.get("BENCH_KV_BITS"), \
        "speculative decode requires a full-precision KV cache"
    assert not os.environ.get("BENCH_PREFIX_GROUPS"), \
        "prefix KV reuse bypasses backend.greedy — run the levers separately"
    from benchmarks.bench_kirag_e2e import build_stack
    from benchmarks.bench_spec_decode import geometry

    import jax
    import jax.numpy as jnp
    from kirag_tpu.models.llm import init_llama_params

    kirag, timings = build_stack(fixed_padding=True)
    questions = QUESTIONS[:N_QUESTIONS]
    backend = kirag.kg_generator.generator.backend
    vocab = backend.config.vocab_size
    wide = 2 * N_QUESTIONS
    kirag.kg_generator.batch_size = wide
    kirag.kg_generator.generator.batch_size = wide
    kirag.constructor.batch_size = wide

    # ---- phase A: record + baseline ----------------------------------------
    streams: dict = {}
    orig_greedy = backend.greedy

    def recording_greedy(input_ids, attention_mask, max_new, **kw):
        b_ids, b_mask = backend._bucket_inputs(np.asarray(input_ids),
                                               np.asarray(attention_mask))
        keys = _row_keys(b_ids, b_mask)
        ids, lg = orig_greedy(input_ids, attention_mask, max_new, **kw)
        for k, row in zip(keys, np.asarray(ids)):
            streams[k] = row.astype(np.int32)
        return ids, lg

    backend.greedy = recording_greedy
    records = []
    for phase in ("compile", "steady"):
        _reset(kirag)
        timings.clear()
        t0 = time.perf_counter()
        base_out = kirag.retrieve_batch(questions)
        wall = time.perf_counter() - t0
        rec = {"bench": "spec_loop", "mode": "baseline", "phase": phase,
               "platform": "cpu_smoke" if SMOKE else "tpu",
               "n_questions": len(questions), "wall_s": round(wall, 2),
               "questions_per_hour": round(3600 * len(questions) / wall, 1),
               "stage_total_s": {k: round(sum(v), 3)
                                 for k, v in sorted(timings.items())},
               "stage_calls": {k: len(v) for k, v in sorted(timings.items())}}
        records.append(rec)
        print(json.dumps(rec), flush=True)
    base_wall = records[-1]["wall_s"]
    print(f"recorded {len(streams)} unique streams", file=sys.stderr,
          flush=True)

    # ---- phase B: speculative at controlled acceptance ---------------------
    d_cfg = geometry("draft")
    if backend.config.vocab_size != d_cfg.vocab_size:  # SMOKE tokenizer
        import dataclasses
        d_cfg = dataclasses.replace(d_cfg, vocab_size=backend.config.vocab_size)
    d_params = init_llama_params(jax.random.PRNGKey(11), d_cfg)
    if not SMOKE:
        d_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            d_params)
    backend.draft_params = d_params
    backend.draft_config = d_cfg
    backend.spec_gamma = GAMMA
    backend.spec_acc_hist = np.zeros((GAMMA,), np.int64)

    state = {"p": ACCEPTS[0], "misses": 0, "rows": 0, "diverged": 0,
             "div_pos": []}

    def script_fn(input_ids, attention_mask):
        keys = _row_keys(input_ids, attention_mask)
        widths = [len(streams[k]) for k in keys if k in streams]
        w = max(widths) if widths else 1
        script = -np.ones((len(keys), w), np.int32)
        for i, k in enumerate(keys):
            s = streams.get(k)
            if s is None:
                state["misses"] += 1
                continue
            rng = np.random.default_rng(int(k[:8], 16) ^ 0xC0FFEE)
            flip = rng.random(len(s)) < (1.0 - state["p"])
            script[i, : len(s)] = np.where(flip, (s + 1) % vocab, s)
        state["rows"] += len(keys)
        return script

    backend.draft_script_fn = script_fn

    def verifying_greedy(input_ids, attention_mask, max_new, **kw):
        # Identity accounting, not an assert (r5 chip lesson): the verify
        # pass computes target logits window-fed (gamma+1 tokens/forward)
        # while plain greedy is cache-fed (1 token/step). At bf16 those are
        # different matmul shapes, and with RANDOM-INIT weights the logit
        # margins are noise-level — argmax near-ties flip between the two
        # formulations, so exact stream equality is a property of f32 (where
        # tests pin it) or of real trained weights (margins >> 1 ulp), not
        # of this rig's random models. Count divergences; report them.
        b_ids, b_mask = backend._bucket_inputs(np.asarray(input_ids),
                                               np.asarray(attention_mask))
        keys = _row_keys(b_ids, b_mask)
        ids, lg = orig_greedy(input_ids, attention_mask, max_new, **kw)
        for k, row in zip(keys, np.asarray(ids)):
            want = streams.get(k)
            if want is not None:
                n = min(len(want), row.shape[0])
                if not (row[:n] == want[:n]).all():
                    state["diverged"] += 1
                    first = int(np.argmax(row[:n] != want[:n]))
                    state["div_pos"].append(first)
        return ids, lg

    backend.greedy = verifying_greedy

    for pi, p in enumerate(ACCEPTS):
        phases = ("compile", "steady") if pi == 0 else ("steady",)
        for phase in phases:
            state["p"] = p
            state["misses"] = 0
            state["rows"] = 0
            state["diverged"] = 0
            state["div_pos"] = []
            backend.spec_acc_hist = np.zeros((GAMMA,), np.int64)
            _reset(kirag)
            timings.clear()
            t0 = time.perf_counter()
            out = kirag.retrieve_batch(questions)
            wall = time.perf_counter() - t0
            hist = backend.spec_acc_hist
            accepted = int((hist * np.arange(GAMMA)).sum())
            # a round examines n_acc proposals plus the rejected one unless
            # it accepted all gamma-1
            examined = accepted + int(hist[: GAMMA - 1].sum())
            rec = {"bench": "spec_loop", "mode": "spec", "phase": phase,
                   "platform": "cpu_smoke" if SMOKE else "tpu",
                   "accept_target": p, "gamma": GAMMA,
                   "draft": "160m-bf16", "n_questions": len(questions),
                   "wall_s": round(wall, 2),
                   "questions_per_hour": round(3600 * len(questions) / wall, 1),
                   "accept_hist": hist.tolist(),
                   "accept_rate": round(accepted / examined, 3) if examined
                   else None,
                   "script_misses": state["misses"],
                   "script_rows": state["rows"],
                   "diverged_rows": state["diverged"],
                   "first_divergence_positions": state["div_pos"][:16],
                   "speedup_vs_baseline": round(base_wall / wall, 2)
                   if phase == "steady" else None,
                   "stage_total_s": {k: round(sum(v), 3)
                                     for k, v in sorted(timings.items())},
                   "stage_calls": {k: len(v)
                                   for k, v in sorted(timings.items())}}
            records.append(rec)
            print(json.dumps(rec), flush=True)
            assert out is not None

    if not SMOKE or os.environ.get("SMOKE_WRITE"):
        with open(OUT, "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
