"""Greedy speculative decoding: draft-and-verify, bit-identical to greedy.

The KiRAG loop is decode-bound (~15 s of a turn is the constructor/KG LLM;
benchmarks/bench_kirag_e2e_results.jsonl), and single-stream greedy decode
is weight-bandwidth-bound: each emitted token reads every weight once. A
small DRAFT model proposes ``gamma - 1`` tokens sequentially (cheap weight
reads), then the TARGET verifies all of them in ONE multi-token forward
(one weight read for up to ``gamma`` emitted tokens). Greedy acceptance —
a draft token is kept iff it equals the target's argmax at that position —
makes the output stream EXACTLY the target's own greedy decode, token for
token (tests pin this against :func:`kirag_tpu.models.llm.greedy_decode`
with an adversarial draft). Expected speedup on aligned drafts is
``(n_accepted + 1)`` tokens per target pass; worst case (nothing accepted)
is one token per pass, like plain greedy plus the draft overhead.

Replaces the reference's single-model ``model.generate`` serving loop
(`/root/reference/retrieve.py:72-84`, torch greedy) with a TPU-native
two-model pipeline; both models reuse the llama-family stack in
:mod:`kirag_tpu.models.llm` (quantized weights compose — an int8/int4
target with a bf16 1.1B draft is the intended serving pair).

Mechanics per round (all rows of the batch stepped together):

1. The draft feeds ``[p0, d1..d_{g-1}]`` sequentially from its own KV
   cache (g single-token steps), producing drafts ``d1..d_{g-1}`` — the
   g-th proposal is discarded; the last feed exists so the draft cache
   holds d_{g-1}'s K/V when every draft is accepted.
2. The target runs ONE g-token forward over the same fed window, giving
   logits rows L[0..g-1]; ``T_i = argmax L[i]`` is the target's token
   after fed position i.
3. ``n_acc`` = length of the all-true prefix of ``d_i == T_i``. The round
   emits ``d1..d_{n_acc}`` then the correction ``T[n_acc]`` — n_acc + 1
   tokens, every one equal to what target-greedy would emit.
4. Both models wrote K/V for all g fed slots; only the first
   ``n_acc + 1`` (p0 + accepted drafts) are real sequence tokens — the
   per-row cache masks zero the rejected tail and ``write_at`` advances
   by ``n_acc + 1``, so the next round overwrites the stale slots.
   Per-ROW bookkeeping (rows accept different counts) uses advanced-index
   scatters; the trash-column trick bounds the output scatter.

EOS follows :func:`greedy_decode`'s pad-after-finish contract: positions
after a row's first eos return eos. Logits (``return_logits=True``) match
greedy's "the distribution that chose the token" contract up to and
including the first eos; after it they are implementation-defined (greedy
feeds forced eos, speculation may have cached the drafted continuation —
the token stream is still identical because both force eos).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kirag_tpu.models.llm import (
    LlamaConfig,
    Params,
    _prefill_state,
    llama_block_forward,
)


def _per_row_state(state, bsz):
    """Widen a :func:`_prefill_state` dict to per-row write_at (rows diverge
    under speculative acceptance)."""
    state = dict(state)
    state["write_at"] = jnp.full((bsz,), state["write_at"], dtype=jnp.int32)
    return state


def _init_spec_state(t_params, t_config, d_params, d_config, input_ids,
                     attention_mask, budget, gamma, compute_dtype,
                     eos_token_id):
    """Prefill BOTH models and build the round-loop state (shared by
    :func:`speculative_decode` and :func:`speculative_start`; only the
    logits buffer and the ``served`` pointer differ per caller). Returns
    ``(first_token, first_logits, state)``; ``budget`` is the stream
    length the output buffer must hold (+gamma round overshoot, +1 trash
    column for the bounded scatter)."""
    bsz = input_ids.shape[0]
    reserve = budget + gamma
    first, first_lg, t_state = _prefill_state(
        t_params, input_ids, attention_mask, t_config, reserve,
        compute_dtype, eos_token_id)
    _, _, d_state = _prefill_state(
        d_params, input_ids, attention_mask, d_config, reserve,
        compute_dtype, eos_token_id)
    width = budget + gamma + 1
    sub_keys = ("k", "v", "cache_mask", "cache_pos", "write_at")
    st = {
        "t": _per_row_state({k: t_state[k] for k in sub_keys}, bsz),
        "d": _per_row_state({k: d_state[k] for k in sub_keys}, bsz),
        "pending": t_state["pending"],
        "pos": t_state["pos"],
        "done": t_state["done"],
        "n_out": jnp.ones((bsz,), jnp.int32),
        "out_ids": jnp.zeros((bsz, width), jnp.int32).at[:, 0].set(first),
        "out_lg": jnp.zeros((bsz, 1, 1), jnp.float32),
        # acceptance accounting: acc_hist[a] = number of (active-row,
        # round) pairs that accepted exactly ``a`` draft tokens. Rides in
        # the state at zero device cost; hosts fetch it per CALL, never
        # per token (relay round trips dominate tiny fetches on this rig)
        "acc_hist": jnp.zeros((gamma,), jnp.int32),
    }
    return first, first_lg, st


def _chain_step(params, config, sub, token, pos1, compute_dtype):
    """One single-token draft step with PER-ROW cache write (mask set
    immediately so the next chain step attends this token)."""
    lg, nk, nv = llama_block_forward(
        params, token[:, None], pos1[:, None], config, sub["k"], sub["v"],
        sub["cache_mask"], compute_dtype=compute_dtype,
        cache_positions=sub["cache_pos"])
    bi = jnp.arange(token.shape[0])
    w = sub["write_at"]
    sub = {
        **sub,
        "k": [k.at[bi, w].set(nk_[:, 0]) for k, nk_ in zip(sub["k"], nk)],
        "v": [v.at[bi, w].set(nv_[:, 0]) for v, nv_ in zip(sub["v"], nv)],
        "cache_mask": sub["cache_mask"].at[bi, w].set(1),
        "cache_pos": sub["cache_pos"].at[bi, w].set(pos1),
        "write_at": w + 1,
    }
    return lg[:, -1], sub


def _rollback(sub, w0, keep, gamma):
    """Zero the cache mask of the ``gamma - keep`` rejected tail slots and
    rewind write_at to ``w0 + keep`` (per row)."""
    bsz = w0.shape[0]
    bi = jnp.arange(bsz)[:, None]
    slots = w0[:, None] + jnp.arange(gamma)[None, :]
    keep_mask = (jnp.arange(gamma)[None, :] < keep[:, None]).astype(jnp.int32)
    return {
        **sub,
        "cache_mask": sub["cache_mask"].at[bi, slots].set(keep_mask),
        "write_at": w0 + keep,
    }


def _spec_round(t_params, t_config, d_params, d_config, st, gamma,
                compute_dtype, eos_token_id, max_out, return_logits,
                draft_script=None):
    """One draft-propose / target-verify round; advances the output stream
    by 1..gamma tokens per active row.

    ``draft_script`` (optional, [B, W] int32) overrides the draft's
    PROPOSAL at each output-stream position: the proposal for stream slot
    ``s`` becomes ``draft_script[b, s]`` where that entry is >= 0 (negative
    = keep the real argmax). The draft forward still runs and its K/V chain
    feeds the overridden token, so the COST of drafting is unchanged — only
    the proposed token is scripted. This is the controllable-agreement
    hook for benchmarking on random-init weights (whose argmax agreement is
    noise, unlike trained checkpoints'): scripting the target's own greedy
    stream with flips at rate ``1 - p`` yields per-proposal acceptance
    exactly ``p`` while every byte of draft/verify work stays real."""
    bsz = st["pending"].shape[0]
    bi = jnp.arange(bsz)
    p0, pos0 = st["pending"], st["pos"]
    active = (~st["done"]) & (st["n_out"] < max_out)

    # ---- 1. draft chain: gamma feeds, gamma-1 used proposals
    d0 = st["d"]
    dw0 = d0["write_at"]
    n_out0 = st["n_out"]

    def dstep(carry, j):
        sub, tok = carry
        lg, sub = _chain_step(d_params, d_config, sub, tok, pos0 + j,
                              compute_dtype)
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        if draft_script is not None:
            # dstep at scan index j produces d_{j+1}, the proposal for
            # output-stream slot n_out + j
            idx = jnp.clip(n_out0 + j, 0, draft_script.shape[1] - 1)
            s = jnp.take_along_axis(draft_script, idx[:, None], axis=1)[:, 0]
            nxt = jnp.where(s >= 0, s, nxt)
        return (sub, nxt), tok

    (dsub, _), fed = jax.lax.scan(
        dstep, (d0, p0), jnp.arange(gamma, dtype=jnp.int32))
    fed = fed.transpose(1, 0)                      # [B, gamma] = [p0, d1..]
    drafts = fed[:, 1:]                            # [B, gamma-1]

    # ---- 2. target verify: one gamma-token forward
    t0 = st["t"]
    tw0 = t0["write_at"]
    positions = pos0[:, None] + jnp.arange(gamma)[None, :]
    lg_t, nk, nv = llama_block_forward(
        t_params, fed, positions, t_config, t0["k"], t0["v"],
        t0["cache_mask"], compute_dtype=compute_dtype,
        cache_positions=t0["cache_pos"])
    targets = jnp.argmax(lg_t, axis=-1).astype(jnp.int32)   # [B, gamma]

    slots = tw0[:, None] + jnp.arange(gamma)[None, :]
    tsub = {
        **t0,
        "k": [k.at[bi[:, None], slots].set(nk_)
              for k, nk_ in zip(t0["k"], nk)],
        "v": [v.at[bi[:, None], slots].set(nv_)
              for v, nv_ in zip(t0["v"], nv)],
        "cache_pos": t0["cache_pos"].at[bi[:, None], slots].set(positions),
    }

    # ---- 3. acceptance: all-true prefix of draft == target
    m = drafts == targets[:, :gamma - 1]                    # [B, gamma-1]
    n_acc = jnp.sum(jnp.cumprod(m.astype(jnp.int32), axis=1), axis=1)
    keep = jnp.where(active, n_acc + 1, 0)                  # fed slots kept
    acc_hist = st["acc_hist"].at[n_acc].add(active.astype(jnp.int32))

    # round outputs: O_i = d_{i+1} for i < n_acc, O_{n_acc} = T[n_acc]
    gi = jnp.arange(gamma)[None, :]
    y = jnp.take_along_axis(targets, n_acc[:, None], axis=1)[:, 0]
    d_pad = jnp.concatenate([drafts, jnp.zeros((bsz, 1), jnp.int32)], axis=1)
    outs = jnp.where(gi < n_acc[:, None], d_pad,
                     jnp.where(gi == n_acc[:, None], y[:, None], 0))
    if eos_token_id is not None:
        # pad-after-finish inside the round: positions after the first eos
        # emit eos (greedy_decode parity)
        e = (outs == eos_token_id).astype(jnp.int32)
        seen_before = jnp.cumsum(e, axis=1) - e
        outs = jnp.where(seen_before > 0, eos_token_id, outs)

    # ---- 4. rollback rejected slots, advance stream
    tsub = _rollback(tsub, tw0, keep, gamma)
    dsub = _rollback(dsub, dw0, keep, gamma)

    valid = gi < keep[:, None]                              # [B, gamma]
    trash = st["out_ids"].shape[1] - 1
    sidx = jnp.where(valid, st["n_out"][:, None] + gi, trash)
    out_ids = st["out_ids"].at[bi[:, None], sidx].set(outs)
    out_lg = st["out_lg"]
    if return_logits:
        out_lg = out_lg.at[bi[:, None], sidx].set(lg_t)

    new_pending = jnp.take_along_axis(outs, n_acc[:, None], axis=1)[:, 0]
    if eos_token_id is not None:
        done_round = jnp.any(valid & (outs == eos_token_id), axis=1)
        new_pending = jnp.where(st["done"] | done_round, eos_token_id,
                                new_pending)
    else:
        done_round = jnp.zeros((bsz,), dtype=bool)
    return {
        **st,
        "t": tsub,
        "d": dsub,
        "pending": jnp.where(active, new_pending, st["pending"]),
        "pos": pos0 + keep,
        "done": st["done"] | done_round,
        "n_out": st["n_out"] + keep,
        "out_ids": out_ids,
        "out_lg": out_lg,
        "acc_hist": acc_hist,
    }


@functools.partial(jax.jit, static_argnames=(
    "t_config", "d_config", "max_new_tokens", "gamma", "compute_dtype",
    "eos_token_id", "return_logits", "return_stats"))
def speculative_decode(t_params: Params, t_config: LlamaConfig,
                       d_params: Params, d_config: LlamaConfig,
                       input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                       max_new_tokens: int, gamma: int = 4,
                       compute_dtype=jnp.float32,
                       eos_token_id: Optional[int] = None,
                       return_logits: bool = True,
                       draft_script: Optional[jnp.ndarray] = None,
                       return_stats: bool = False):
    """Drop-in :func:`kirag_tpu.models.llm.greedy_decode` with a draft model:
    same (ids [B, G], logits [B, G, V]) contract, identical token stream.

    ``gamma`` is the fed-window length per round (gamma - 1 draft
    proposals + the always-emitted correction). Both models must share the
    tokenizer/vocab; prompts are LEFT-padded like greedy_decode.

    ``draft_script`` ([B, W] int32, optional): per-stream-position proposal
    override for controllable-agreement benchmarking (see
    :func:`_spec_round`); entries < 0 keep the draft's real argmax.
    ``return_stats`` additionally returns the per-round acceptance
    histogram ``acc_hist`` ([gamma] int32: rounds that accepted exactly
    ``a`` drafts, summed over active rows).
    """
    assert gamma >= 1
    bsz = input_ids.shape[0]
    first, first_lg, st = _init_spec_state(
        t_params, t_config, d_params, d_config, input_ids, attention_mask,
        max_new_tokens, gamma, compute_dtype, eos_token_id)
    if return_logits:
        width = st["out_ids"].shape[1]
        st["out_lg"] = (jnp.zeros((bsz, width, t_config.vocab_size),
                                  jnp.float32).at[:, 0].set(first_lg))

    def cond(st):
        return jnp.any((~st["done"]) & (st["n_out"] < max_new_tokens))

    def body(st):
        return _spec_round(t_params, t_config, d_params, d_config, st,
                           gamma, compute_dtype, eos_token_id,
                           max_new_tokens, return_logits,
                           draft_script=draft_script)

    st = jax.lax.while_loop(cond, body, st)
    ids = st["out_ids"][:, :max_new_tokens]
    col = jnp.arange(max_new_tokens)[None, :]
    if eos_token_id is not None:
        # rows that finished early pad with eos (greedy parity)
        ids = jnp.where(col < st["n_out"][:, None], ids, eos_token_id)
    lg = st["out_lg"][:, :max_new_tokens] if return_logits else None
    if return_stats:
        return ids, lg, st["acc_hist"]
    return ids, lg


# -----------------------------------------------------------------------------
# KV-cache-resumable segmented variant (the stop-word serving loop)
# -----------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "t_config", "d_config", "total_new_tokens", "gamma", "compute_dtype",
    "eos_token_id"))
def speculative_start(t_params: Params, t_config: LlamaConfig,
                      d_params: Params, d_config: LlamaConfig,
                      input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                      total_new_tokens: int, gamma: int = 4,
                      compute_dtype=jnp.float32,
                      eos_token_id: Optional[int] = None):
    """Speculative analogue of :func:`kirag_tpu.models.llm.prefill_decode`:
    prefill BOTH models, emit the first token, return a resumable state.

    Rounds may overshoot a resume's step budget; surplus tokens stay in the
    state's output buffer and are served by the next resume — no decode
    work is ever discarded. Logits are not carried (the segmented KiRAG
    constructor loop runs ``return_logits=False``; use
    :func:`speculative_decode` when per-token logits are needed).
    """
    first, _, st = _init_spec_state(
        t_params, t_config, d_params, d_config, input_ids, attention_mask,
        total_new_tokens, gamma, compute_dtype, eos_token_id)
    st["served"] = jnp.ones((), jnp.int32)                 # first token below
    return first[:, None], st


@functools.partial(jax.jit, static_argnames=(
    "t_config", "d_config", "n_steps", "total_new_tokens", "gamma",
    "compute_dtype", "eos_token_id"))
def speculative_resume(t_params: Params, t_config: LlamaConfig,
                       d_params: Params, d_config: LlamaConfig,
                       state, n_steps: int, total_new_tokens: int,
                       gamma: int = 4, compute_dtype=jnp.float32,
                       eos_token_id: Optional[int] = None,
                       draft_script: Optional[jnp.ndarray] = None):
    """Serve the next ``n_steps`` tokens of every row's stream (buffered
    surplus first, then fresh draft/verify rounds). Same stream contract as
    :func:`kirag_tpu.models.llm.resume_decode` with ``return_logits=False``.
    ``draft_script`` as in :func:`speculative_decode` (stream positions are
    absolute, so pass the same array to every resume of a sequence).
    """
    cap = jnp.minimum(state["served"] + n_steps, total_new_tokens)

    def cond(st):
        return jnp.any((~st["done"]) & (st["n_out"] < cap))

    def body(st):
        return _spec_round(t_params, t_config, d_params, d_config, st,
                           gamma, compute_dtype, eos_token_id,
                           total_new_tokens, return_logits=False,
                           draft_script=draft_script)

    st = jax.lax.while_loop(cond, body, state)
    bsz = st["pending"].shape[0]
    # clamped GATHER, not dynamic_slice: a caller overrunning the
    # total_new_tokens budget must get pad tokens, not a silently shifted
    # re-serve of old stream positions (dynamic_slice clamps its start)
    col = state["served"] + jnp.arange(n_steps)[None, :]            # [1, S]
    width = st["out_ids"].shape[1]
    gcol = jnp.clip(col, 0, width - 1)
    ids = jnp.take_along_axis(st["out_ids"],
                              jnp.broadcast_to(gcol, (bsz, n_steps)), axis=1)
    pad = eos_token_id if eos_token_id is not None else 0
    ids = jnp.where((col < st["n_out"][:, None]) & (col < width - 1),
                    ids, pad)
    st = {**st, "served": state["served"] + n_steps}
    return ids, st
