"""Tests for the Pallas int4 weight matmul (ops/pallas_qmm) and the
int4_impl dispatch in models/llm._dense.

Why three formulations exist: XLA cannot fuse the blockwise int4 dequant
into a matmul operand — it materializes the dequantized kernel every decode
step, which made int4 decode SLOWER than int8 on chip (r4 rows). The pallas
kernel dequantizes in VMEM (HBM traffic = packed bytes only); "blockdot" and
"parity" are the GSPMD-safe XLA fallbacks. All three must agree with the
dequant oracle bit-for-policy (f32 accumulation, per-block f32 scaling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kirag_tpu.models.llm import (
    INT4_BLOCK, LlamaConfig, _dense, _quantize_kernel_int4, _unpack_int4,
    greedy_decode, init_llama_params, quantize_llama_params)
from kirag_tpu.ops.pallas_qmm import int4_matmul, supported


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _oracle(x, p):
    q = np.asarray(_unpack_int4(p["kernel_q4"], jnp.float32))
    scale = np.asarray(p["kernel_scale4"])
    in_pad, out_dim = q.shape
    deq = (q.reshape(-1, INT4_BLOCK, out_dim) * scale[:, None, :]
           ).reshape(in_pad, out_dim)
    return np.asarray(x, np.float32) @ deq


class TestInt4Matmul:
    @pytest.mark.parametrize("in_dim,out_dim,b", [
        (512, 512, 4),    # bh=256, bo=512
        (1024, 768, 1),   # bo falls back to 256
        (512, 640, 12),   # bo falls back to 128; batch pads 12 -> 16
    ])
    def test_matches_oracle(self, rng, in_dim, out_dim, b):
        k = rng.randn(in_dim, out_dim).astype(np.float32) * 0.05
        p = _quantize_kernel_int4(k)
        x = rng.randn(b, in_dim).astype(np.float32)
        got = np.asarray(int4_matmul(jnp.asarray(x), p["kernel_q4"],
                                     p["kernel_scale4"]), np.float32)
        ref = _oracle(x, p)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_3d_leading_dims(self, rng):
        k = rng.randn(512, 512).astype(np.float32) * 0.05
        p = _quantize_kernel_int4(k)
        x = rng.randn(2, 3, 512).astype(np.float32)
        got = np.asarray(int4_matmul(jnp.asarray(x), p["kernel_q4"],
                                     p["kernel_scale4"]), np.float32)
        ref = _oracle(x.reshape(6, 512), p).reshape(2, 3, 512)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_unsupported_tiling_raises(self, rng):
        k = rng.randn(128, 512).astype(np.float32)  # half=64: no legal bh
        p = _quantize_kernel_int4(k)
        assert not supported(64, 512)
        with pytest.raises(ValueError, match="unsupported tiling"):
            int4_matmul(jnp.ones((4, 128), jnp.float32),
                        p["kernel_q4"], p["kernel_scale4"])

    def test_supported_predicate(self):
        assert supported(2048, 14336)      # Llama-3-8B hidden -> ffn
        assert supported(256, 128256)      # lm_head: vocab % 256 == 0
        assert not supported(96, 512)      # half not divisible by 256


class TestNF4Kernel:
    """codebook= switches the kernel's nibbles to unsigned NF4 indices,
    dequantized in-VMEM by the select tree (no per-element gather on TPU)."""

    @staticmethod
    def _nf4_oracle(x, p):
        pk = np.asarray(p["kernel_q4"])
        cb = np.asarray(p["kernel_cb4"])
        scale = np.asarray(p["kernel_scale4"])
        half, out = pk.shape
        idx = np.empty((2 * half, out), np.uint8)
        idx[0::2] = pk & 0xF
        idx[1::2] = pk >> 4
        deq = (cb[idx].reshape(-1, INT4_BLOCK, out)
               * scale[:, None, :]).reshape(2 * half, out)
        return np.asarray(x, np.float32) @ deq

    @pytest.mark.parametrize("in_dim,out_dim,b", [(512, 512, 4),
                                                  (512, 640, 12)])
    def test_nf4_matches_oracle(self, rng, in_dim, out_dim, b):
        from kirag_tpu.models.llm import _quantize_kernel_nf4

        k = rng.randn(in_dim, out_dim).astype(np.float32) * 0.05
        p = _quantize_kernel_nf4(k)
        x = rng.randn(b, in_dim).astype(np.float32)
        got = np.asarray(int4_matmul(jnp.asarray(x), p["kernel_q4"],
                                     p["kernel_scale4"],
                                     codebook=p["kernel_cb4"]), np.float32)
        np.testing.assert_allclose(got, self._nf4_oracle(x, p),
                                   rtol=2e-5, atol=2e-5)

    def test_nf4_all_impls_agree(self, rng):
        from kirag_tpu.models.llm import _quantize_kernel_nf4

        k = rng.randn(512, 640).astype(np.float32) * 0.05
        p = _quantize_kernel_nf4(k)
        x = rng.randn(3, 512).astype(np.float32)
        ref = self._nf4_oracle(x, p)
        for impl in ("parity", "blockdot", "pallas"):
            got = np.asarray(_dense(jnp.asarray(x), p, impl), np.float32)
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                                       err_msg=impl)

    def test_lut16_select_tree_is_exact(self):
        from kirag_tpu.models.llm import NF4_CODEBOOK
        from kirag_tpu.ops.pallas_qmm import _lut16

        idx = jnp.arange(16, dtype=jnp.int32).reshape(2, 8)
        got = np.asarray(_lut16(idx, [float(v) for v in NF4_CODEBOOK]))
        np.testing.assert_array_equal(got.reshape(-1), NF4_CODEBOOK)


class TestDenseImplDispatch:
    @pytest.mark.parametrize("impl", ["parity", "blockdot", "pallas"])
    def test_impls_match_oracle(self, rng, impl):
        k = rng.randn(512, 640).astype(np.float32) * 0.05
        p = _quantize_kernel_int4(k)
        x = rng.randn(3, 512).astype(np.float32)
        got = np.asarray(_dense(jnp.asarray(x), p, impl), np.float32)
        np.testing.assert_allclose(got, _oracle(x, p), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("impl", ["blockdot", "pallas"])
    def test_ragged_in_dim_pads(self, rng, impl):
        # in_dim 100 pads to the 128-row block grid before dispatch; the
        # pallas branch then falls back to blockdot (half=64 untileable)
        k = rng.randn(100, 128).astype(np.float32)
        p = _quantize_kernel_int4(k)
        x = rng.randn(3, 100).astype(np.float32)
        got = np.asarray(_dense(jnp.asarray(x), p, impl), np.float32)
        q = np.asarray(_unpack_int4(p["kernel_q4"], jnp.float32))
        scale = np.asarray(p["kernel_scale4"])
        deq = (q.reshape(-1, 64, 128) * scale[:, None, :]).reshape(-1, 128)[:100]
        np.testing.assert_allclose(got, x @ deq, rtol=1e-4, atol=1e-4)

    def test_prefill_rows_fall_back_to_parity(self, rng):
        # impl="pallas" is decode-shaped only: above 32 activation rows the
        # K=32 sub-block contraction starves the MXU, so _dense must route
        # prefill through the parity matmul (trace-time branch; exactness
        # must hold either way)
        k = rng.randn(512, 512).astype(np.float32) * 0.05
        p = _quantize_kernel_int4(k)
        x = rng.randn(64, 512).astype(np.float32)
        got = np.asarray(_dense(jnp.asarray(x), p, "pallas"), np.float32)
        np.testing.assert_allclose(got, _oracle(x, p), rtol=1e-4, atol=1e-4)

    def test_bias_applies_on_every_impl(self, rng):
        k = rng.randn(512, 512).astype(np.float32) * 0.05
        p = dict(_quantize_kernel_int4(k))
        p["bias"] = jnp.asarray(rng.randn(512).astype(np.float32))
        x = rng.randn(2, 512).astype(np.float32)
        ref = _oracle(x, p) + np.asarray(p["bias"])
        for impl in ("parity", "blockdot", "pallas"):
            got = np.asarray(_dense(jnp.asarray(x), p, impl), np.float32)
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestDecodeAcrossImpls:
    def test_greedy_decode_identical_ids(self, rng):
        # pallas-tileable tiny geometry: hidden 512 (half 256), ffn 512,
        # vocab 256 (bo 256), kv_dim 256
        config = LlamaConfig(vocab_size=256, hidden_size=512,
                             num_hidden_layers=2, num_attention_heads=8,
                             num_key_value_heads=4, intermediate_size=512,
                             max_position_embeddings=128, rope_theta=1e4)
        params = init_llama_params(jax.random.PRNGKey(0), config)
        qparams = quantize_llama_params(params, bits=4)
        ids = jnp.asarray(rng.randint(1, 256, size=(2, 6)), jnp.int32)
        mask = jnp.ones_like(ids)
        outs = {}
        for impl in ("parity", "blockdot", "pallas"):
            cfg = __import__("dataclasses").replace(config, int4_impl=impl)
            out_ids, logits = greedy_decode(qparams, ids, mask, cfg, 4)
            outs[impl] = (np.asarray(out_ids), np.asarray(logits))
        base_ids, base_logits = outs["parity"]
        for impl in ("blockdot", "pallas"):
            np.testing.assert_array_equal(outs[impl][0], base_ids)
            np.testing.assert_allclose(outs[impl][1], base_logits,
                                       rtol=2e-3, atol=2e-3)
