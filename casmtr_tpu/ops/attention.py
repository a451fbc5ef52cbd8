"""Dense attention primitives: linear (Transformers-are-RNNs) and full
attention (reference: src/model/modules/linear_attention.py:14-81).

All functions take [B, L, H, D] token layouts and optional [B, L] masks.
Computations run in float32 regardless of input dtype (the reference wraps
these in fp32 autocast islands; linear_attention.py:42-45 rescales against
fp16 overflow — with fp32 accumulation the rescale is kept for bit-parity).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def elu_feature_map(x):
    return jax.nn.elu(x) + 1.0


def linear_attention(q, k, v, q_mask: Optional[jnp.ndarray] = None,
                     kv_mask: Optional[jnp.ndarray] = None,
                     eps: float = 1e-6) -> jnp.ndarray:
    """O(N) linear attention (reference: linear_attention.py:20-47).

    q: [B, L, H, D]; k/v: [B, S, H, D]; masks: [B, L]/[B, S] (1=valid).
    """
    q = elu_feature_map(q.astype(jnp.float32))
    k = elu_feature_map(k.astype(jnp.float32))
    v = v.astype(jnp.float32)
    if q_mask is not None:
        q = q * q_mask[:, :, None, None]
    if kv_mask is not None:
        k = k * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]
    v_len = v.shape[1]
    v = v / v_len
    kv = jnp.einsum("bshd,bshv->bhdv", k, v)
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", q, k.sum(axis=1)) + eps)
    out = jnp.einsum("blhd,bhdv,blh->blhv", q, kv, z) * v_len
    return out


def full_attention(q, k, v, q_mask: Optional[jnp.ndarray] = None,
                   kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Standard softmax attention (reference: linear_attention.py:56-81).

    q: [B, L, H, D]; k/v: [B, S, H, D]; masks [B, L]/[B, S].
    """
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    qk = jnp.einsum("blhd,bshd->blsh", q, k,
                    preferred_element_type=jnp.float32)
    if kv_mask is not None and q_mask is not None:
        valid = (q_mask[:, :, None, None] * kv_mask[:, None, :, None]) > 0
        qk = jnp.where(valid, qk, -jnp.inf)
    temp = 1.0 / (q.shape[-1] ** 0.5)
    A = jax.nn.softmax(temp * qk, axis=2)
    if kv_mask is not None and q_mask is not None:
        A = jnp.nan_to_num(A)  # fully-masked rows
    return jnp.einsum("blsh,bshd->blhd", A, v,
                      preferred_element_type=jnp.float32)
