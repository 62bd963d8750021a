"""Worker for the two-process multi-host smoke test (test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a 4-device global
mesh. Exercises the two cross-process paths the framework claims
(SURVEY.md §2.11): the global-batch contrastive loss (GSPMD inserts the
embedding all-gather across processes) and the sharded index search (per-shard
top-k + cross-process all_gather merge).

Usage: python multihost_worker.py <process_id> <num_processes> <coordinator>
Prints one JSON line with the results for the parent to compare.
"""

import json
import os
import sys

proc_id, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

from kirag_tpu.ops.mips import sharded_topk_mips  # noqa: E402
from kirag_tpu.parallel import create_mesh, distributed_init  # noqa: E402

distributed_init(coord, nproc, proc_id)
assert jax.process_count() == nproc
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * nproc

mesh = create_mesh()  # (data=4, model=1) spanning both processes
row_sharding = NamedSharding(mesh, PartitionSpec("data"))

# --- sharded search across processes ----------------------------------------
N, D, Q, K = 256, 16, 4, 5
rng = np.random.default_rng(0)  # same data in every process
corpus = rng.standard_normal((N, D), dtype=np.float32)
queries = jnp.asarray(corpus[:Q])
global_corpus = jax.make_array_from_callback((N, D), row_sharding,
                                             lambda idx: corpus[idx])
vals, idx = sharded_topk_mips(queries, global_corpus, K, mesh, chunk_size=32)
vals, idx = np.asarray(vals), np.asarray(idx)

# --- global-batch in-batch contrastive loss ----------------------------------
B = 8
q_emb = corpus[:B]
d_emb = np.roll(corpus[:B], 1, axis=1)


def contrastive(q, d):
    logits = (q @ d.T) / 0.05
    labels = jnp.arange(q.shape[0])
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[labels, labels])


q_g = jax.make_array_from_callback((B, D), row_sharding, lambda i: q_emb[i])
d_g = jax.make_array_from_callback((B, D), row_sharding, lambda i: d_emb[i])
loss = float(jax.jit(contrastive)(q_g, d_g))

print(json.dumps({"proc": proc_id, "loss": loss,
                  "idx": idx.tolist(), "vals": vals.tolist()}))
