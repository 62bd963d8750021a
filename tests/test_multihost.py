"""Two-process multi-host smoke: `distributed_init` + cross-process collectives.

The virtual 8-device mesh in conftest covers single-process multi-device only;
this spawns TWO real processes (2 CPU devices each) joined through
`jax.distributed.initialize` — the CPU stand-in for a 2-host TPU pod slice —
and checks that the sharded search merge and the global contrastive loss
produce process-identical, oracle-correct results across the process boundary.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {**os.environ, "PYTHONPATH": os.path.dirname(here)}
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2", coord],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = sorted(outs, key=lambda r: r["proc"])
    # both processes observe identical replicated results
    assert r0["idx"] == r1["idx"]
    np.testing.assert_allclose(r0["vals"], r1["vals"], rtol=1e-6)
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=1e-6)

    # oracle: same seeds as the worker
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((256, 16), dtype=np.float32)
    scores = corpus[:4] @ corpus.T
    order = np.lexsort((np.arange(256)[None].repeat(4, 0), -scores), axis=-1)[:, :5]
    np.testing.assert_array_equal(np.asarray(r0["idx"]), order)
    np.testing.assert_allclose(
        np.asarray(r0["vals"]), np.take_along_axis(scores, order, -1),
        rtol=1e-4, atol=1e-4)

    q = corpus[:8]
    d = np.roll(corpus[:8], 1, axis=1)
    logits = (q @ d.T) / 0.05
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    ref_loss = -np.mean(np.diag(logp))
    np.testing.assert_allclose(r0["loss"], ref_loss, rtol=1e-4)
