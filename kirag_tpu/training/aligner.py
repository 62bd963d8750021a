"""Reasoning Chain Aligner training: in-batch contrastive bi-encoder.

The TPU re-design of the reference's `InBatchRetriever.forward` +
`AlignerTrainer` (`retriever/retrievers.py:131-150`,
`trainer/aligner_trainer.py`): queries and (1 positive + N negative) triple
texts are embedded by the shared encoder, scored q.d/temperature, and trained
with cross-entropy against the positive column.

Cross-device in-batch negatives: the reference all-gathers embeddings across
ranks with local-grad-preserving splicing (`utils/utils.py:158-188`). Here the
batch is simply sharded over the mesh ``data`` axis and the loss is written
against the GLOBAL score matrix — GSPMD inserts the gathers and reduces the
gradients; no hand-written collectives.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kirag_tpu.models.bert import BertConfig, bert_encode
from kirag_tpu.models.encoders import ENCODER_POOLING
from kirag_tpu.ops.pooling import l2_normalize
from kirag_tpu.training.trainer import BaseTrainer, TrainerConfig


def _embed(params, args: Dict[str, jnp.ndarray], config: BertConfig, encoder_type: str,
           compute_dtype) -> jnp.ndarray:
    hidden = bert_encode(params, args["input_ids"], args["attention_mask"], config,
                         compute_dtype=compute_dtype)
    pooled = ENCODER_POOLING[encoder_type]["pool"](hidden.astype(jnp.float32),
                                                   args["attention_mask"])
    if ENCODER_POOLING[encoder_type]["normalize"]:
        pooled = l2_normalize(pooled)
    return pooled


def _embed_packed(params, query_args: Dict[str, jnp.ndarray],
                  doc_args: Dict[str, jnp.ndarray], config: BertConfig,
                  encoder_type: str, compute_dtype):
    """Queries + docs in ONE encoder forward via sequence packing.

    ``q_len // d_len`` docs share each packed row: positions restart per doc
    and attention is confined to same-segment tokens (`bert_encode`'s
    segment_ids — the flash kernel's native SegmentIds on TPU), so the math
    per doc is identical to the two-call form while the matmuls run at
    ~double the batch (the "query+doc packing" lever, docs/DESIGN.md §7:
    one program instead of two differently-shaped tower calls).
    Requires q_len % d_len == 0 and num_docs % (q_len // d_len) == 0 —
    the collator's bucketing guarantees both at production geometry.
    """
    q_ids, q_mask = query_args["input_ids"], query_args["attention_mask"]
    d_ids, d_mask = doc_args["input_ids"], doc_args["attention_mask"]
    bq, lq = q_ids.shape
    bd, ld = d_ids.shape
    r = lq // ld
    rows = bd // r
    ids = jnp.concatenate([q_ids, d_ids.reshape(rows, r * ld)], axis=0)
    mask = jnp.concatenate([q_mask, d_mask.reshape(rows, r * ld)], axis=0)
    pos = jnp.concatenate([
        jnp.broadcast_to(jnp.arange(lq)[None], (bq, lq)),
        jnp.broadcast_to(jnp.tile(jnp.arange(ld), r)[None], (rows, r * ld)),
    ], axis=0)
    # segment 0 = padding (pads attend among themselves, never pooled);
    # doc s in a packed row gets segment s+1; query rows are single-segment
    seg_d = (d_mask.reshape(rows, r, ld).astype(jnp.int32)
             * (1 + jnp.arange(r, dtype=jnp.int32))[None, :, None])
    seg = jnp.concatenate([q_mask.astype(jnp.int32),
                           seg_d.reshape(rows, r * ld)], axis=0)
    hidden = bert_encode(params, ids, mask, config,
                         compute_dtype=compute_dtype,
                         position_ids=pos, segment_ids=seg)
    h_q = hidden[:bq]
    h_d = hidden[bq:].reshape(bd, ld, -1)
    pool = ENCODER_POOLING[encoder_type]["pool"]
    q_emb = pool(h_q.astype(jnp.float32), q_mask)
    d_emb = pool(h_d.astype(jnp.float32), d_mask)
    if ENCODER_POOLING[encoder_type]["normalize"]:
        q_emb = l2_normalize(q_emb)
        d_emb = l2_normalize(d_emb)
    return q_emb, d_emb


def _can_pack(batch) -> bool:
    bq, lq = batch["query_args"]["input_ids"].shape
    bd, ld = batch["doc_args"]["input_ids"].shape
    return ld > 0 and lq % ld == 0 and bd % (lq // ld) == 0


def in_batch_contrastive_loss(params, batch, config: BertConfig, encoder_type: str = "e5",
                              temperature: float = 0.01, compute_dtype=jnp.float32,
                              remat: bool = False, packed: bool = False):
    """CE over the global [num_queries, num_docs] score matrix.

    ``batch`` = {"query_args", "doc_args", "positive_doc_indices"} as produced
    by the training collator (`kirag_tpu.data.collators`).

    ``remat=True`` rematerializes the encoder forwards during the backward
    pass (jax.checkpoint): required at e5-large geometry on one v5e —
    storing all 24 layers' activations for b32 x q256 + b128 x d64 OOMs HBM
    (measured 17.8G vs 15.75G); with remat the step fits comfortably.
    ``remat="dots"`` checkpoints with the ``dots_saveable`` policy instead:
    matmul outputs are SAVED (~7 GB bf16 at this geometry — still inside
    HBM) and only the cheap elementwise/softmax/layernorm pieces recompute,
    so the backward pays ~3x forward FLOPs instead of full-remat's ~4x.

    ``packed=True`` runs queries and docs through ONE encoder forward
    (:func:`_embed_packed`); falls back to the two-call form when the batch
    geometry doesn't pack (q_len % d_len != 0).
    """
    kw = {}
    if remat == "dots":
        kw["policy"] = jax.checkpoint_policies.dots_saveable
    if packed and _can_pack(batch):
        embed2 = (jax.checkpoint(_embed_packed, static_argnums=(3, 4, 5), **kw)
                  if remat else _embed_packed)
        q_emb, d_emb = embed2(params, batch["query_args"], batch["doc_args"],
                              config, encoder_type, compute_dtype)
    else:
        embed = (jax.checkpoint(_embed, static_argnums=(2, 3, 4), **kw)
                 if remat else _embed)
        q_emb = embed(params, batch["query_args"], config, encoder_type, compute_dtype)
        d_emb = embed(params, batch["doc_args"], config, encoder_type, compute_dtype)
    scores = (q_emb @ d_emb.T) / temperature
    labels = batch["positive_doc_indices"]
    log_probs = jax.nn.log_softmax(scores, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=-1))
    acc = jnp.mean((jnp.argmax(scores, axis=-1) == labels).astype(jnp.float32))
    return loss, {"accuracy": acc}


class AlignerTrainer(BaseTrainer):
    """Trains the aligner encoder; evaluates per-query MRR over each query's
    own positive+negative candidates (reference `aligner_trainer.py:88-115`)."""

    def __init__(self, params, bert_config: BertConfig, config: TrainerConfig,
                 train_loader, eval_loader=None, encoder_type: str = "e5",
                 temperature: float = 0.01, compute_dtype=jnp.float32,
                 num_candidates_per_query: Optional[int] = None, mesh=None,
                 batch_sharding=None, remat: bool = False, packed: bool = False,
                 trackers=()):
        self.bert_config = bert_config
        self.encoder_type = encoder_type
        self.temperature = temperature
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.packed = packed
        self.num_candidates_per_query = num_candidates_per_query
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # tensor-parallel training: shard encoder weights over the model
            # axis (Megatron layout); optimizer state inherits the shardings
            from jax.sharding import NamedSharding

            from kirag_tpu.models.bert import param_shardings

            specs = param_shardings(bert_config)
            # route through host numpy: device_put of a device array can alias
            # the source's buffers as one replica, and the trainer DONATES its
            # params each step — an alias would delete the caller's encoder
            # weights out from under it
            params = jax.tree.map(
                lambda p, s: jax.device_put(np.asarray(p), NamedSharding(mesh, s)),
                params, specs)
        super().__init__(params, config, train_loader, eval_loader,
                         mesh=mesh, batch_sharding=batch_sharding,
                         trackers=trackers)
        self._jit_scores = jax.jit(self._score_batch)

    @staticmethod
    def pack_batch(collated) -> Dict:
        """Adapt the collator's tuple output to the loss dict."""
        query_args, doc_args, positive_doc_indices, index = collated
        return {
            "query_args": query_args,
            "doc_args": doc_args,
            "positive_doc_indices": positive_doc_indices,
            "index": index,
        }

    def loss_fn(self, params, batch):
        return in_batch_contrastive_loss(
            params, batch, self.bert_config, self.encoder_type,
            self.temperature, self.compute_dtype, remat=self.remat,
            packed=self.packed)

    def _score_batch(self, params, batch):
        q_emb = _embed(params, batch["query_args"], self.bert_config, self.encoder_type,
                       self.compute_dtype)
        d_emb = _embed(params, batch["doc_args"], self.bert_config, self.encoder_type,
                       self.compute_dtype)
        return q_emb @ d_emb.T

    def evaluate(self, params, eval_loader) -> float:
        """Mean reciprocal rank of each query's positive among its OWN
        candidate block [pos, neg_1..neg_k]."""
        rr = []
        for collated in eval_loader:
            batch = self.device_put_batch(self.pack_batch(collated))
            scores = np.asarray(self._jit_scores(params, batch))
            pos_idx = np.asarray(batch["positive_doc_indices"])
            n_q = len(pos_idx)
            n_docs = scores.shape[1]
            for i in range(n_q):
                start = int(pos_idx[i])
                end = int(pos_idx[i + 1]) if i + 1 < n_q else n_docs
                block = scores[i, start:end]
                rank = 1 + int(np.sum(block > block[0]))
                rr.append(1.0 / rank)
        return float(np.mean(rr)) if rr else 0.0

    def training_step(self, collated):
        return super().training_step(self.pack_batch(collated))

    def evaluate_corpus_mrr(self, params, eval_loader, max_docs: Optional[int] = None) -> float:
        """Corpus-wide MRR: rank each query's positive against ALL candidate
        docs across the eval set (reference `aligner_trainer.py:32-80`) —
        harder than the per-query block MRR of :meth:`evaluate`."""
        q_embs, d_embs, pos_global = [], [], []
        offset = 0
        for collated in eval_loader:
            batch = self.device_put_batch(self.pack_batch(collated))
            q = np.asarray(_embed(params, batch["query_args"], self.bert_config,
                                  self.encoder_type, self.compute_dtype))
            d = np.asarray(_embed(params, batch["doc_args"], self.bert_config,
                                  self.encoder_type, self.compute_dtype))
            pos = np.asarray(batch["positive_doc_indices"]) + offset
            q_embs.append(q)
            d_embs.append(d)
            pos_global.extend(pos.tolist())
            offset += len(d)
            if max_docs and offset >= max_docs:
                break
        q_all = np.concatenate(q_embs)
        d_all = np.concatenate(d_embs)
        scores = q_all @ d_all.T
        rr = []
        for i, pos in enumerate(pos_global):
            rank = 1 + int(np.sum(scores[i] > scores[i, pos]))
            rr.append(1.0 / rank)
        return float(np.mean(rr)) if rr else 0.0

    def save_encoder(self, save_dir: str) -> None:
        """Persist the trained encoder in our loadable format, so checkpoints
        feed directly into retrieval (the analogue of the reference's
        `save_pretrained`, `aligner_trainer.py:14-17`)."""
        from kirag_tpu.models.encoders import Encoder

        Encoder(self.params, self.bert_config, self.encoder_type).save(save_dir)
