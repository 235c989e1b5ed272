"""Scaled linear attention — the core Phyloformer operator, in JAX.

Numerics mirror the reference kernel exactly
(`/root/reference/phyloformer/attention.py:143-197`):

- Q and K are projected to ``nb_heads`` scalars (one per head:
  ``qk_dim = nb_heads`` ⇒ per-head qk dimension 1).
- feature map ``φ(x) = elu(x) + 1`` (positive);
- Q is rescaled by its mean over the attended axis;
- K is normalized to sum to 1 over the attended axis;
- output is ``φQ · (φKᵀ V)`` — linear in the attended-axis length, no
  softmax, no attention matrix (Katharopoulos et al. 2020 family).

Because the per-head Q/K are scalars, "attention" degenerates to: a
k-weighted average of V over the attended axis, scaled per-position by q.
That makes the attended-axis state a single ``(H, head_dim)`` tile, so the
op is bandwidth-bound — XLA fuses the elementwise chains; the only MXU work
is the V/out projections.  A fused Pallas kernel lives in
``phyloformer_tpu.ops.pallas``.

Masking (our extension; the reference runs batch=1 unpadded): a boolean mask
over the attended axis enters every reduction (q-mean count, k-sum, kᵀv), so
padded positions are exact no-ops. With a full mask the result is bit-equal
to the unmasked path.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def phi(x: jax.Array) -> jax.Array:
    """The linear-attention feature map φ(x) = elu(x) + 1 (> 0)."""
    return jax.nn.elu(x) + 1.0


def scaled_linear_attention(
    x: jax.Array,
    params: Dict[str, jax.Array],
    n_heads: int,
    mask: Optional[jax.Array] = None,
    eps: float = 0.0,
) -> jax.Array:
    """Apply scaled linear attention over axis ``-2`` of ``x``.

    Args:
      x: ``(..., A, d)`` activations; attention mixes over ``A``.
      params: ``wq/bq`` ``(d, H)``, ``wk/bk`` ``(d, H)``, ``wv/bv`` ``(d, d)``,
        ``wo/bo`` ``(d, d)``.
      n_heads: number of heads ``H``; per-head value dim is ``d // H``.
      mask: optional boolean ``(..., A)`` (or broadcastable); False = padded.
      eps: optional denominator epsilon (reference uses exact division).

    Returns:
      ``(..., A, d)``; padded positions contribute nothing to real outputs.
    """
    d = x.shape[-1]
    a = x.shape[-2]
    head_dim = d // n_heads

    q = phi(x @ params["wq"] + params["bq"])  # (..., A, H)
    k = phi(x @ params["wk"] + params["bk"])  # (..., A, H)
    v = x @ params["wv"] + params["bv"]  # (..., A, d)

    if mask is not None:
        m = mask[..., None].astype(q.dtype)  # (..., A, 1)
        q = q * m
        k = k * m
        count = jnp.sum(m, axis=-2, keepdims=True)  # (..., 1, 1)
        q_mean = jnp.sum(q, axis=-2, keepdims=True) / jnp.maximum(count, 1.0)
        k_sum = jnp.sum(k, axis=-2, keepdims=True)
        # Fully-masked axes (padding-only batch rows) give zero sums; 0/0
        # would be NaN — masked out of any loss, but NaN poisons gradients
        # (NaN * 0 = NaN in the backward pass). Substitute 1 — the outputs
        # there are masked garbage either way.
        q_mean = jnp.where(q_mean > 0, q_mean, 1.0)
        k_sum = jnp.where(k_sum > 0, k_sum, 1.0)
    else:
        q_mean = jnp.mean(q, axis=-2, keepdims=True)
        k_sum = jnp.sum(k, axis=-2, keepdims=True)

    # Scale Q to keep amplitude under control; normalize K to a distribution
    # over the attended axis (reference attention.py:183-188).
    q = q / (q_mean + eps)
    k = k / (k_sum + eps)

    # Per head h: ctx[h] = Σ_A k[A,h] * v[A, h*hd:(h+1)*hd]  -> (..., H, hd)
    v_heads = v.reshape(v.shape[:-1] + (n_heads, head_dim))
    ctx = jnp.einsum("...ah,...ahd->...hd", k, v_heads)
    out = jnp.einsum("...ah,...hd->...ahd", q, ctx)
    out = out.reshape(out.shape[:-2] + (d,))

    return out @ params["wo"] + params["bo"]


def multi_head_attention(
    x: jax.Array,
    params: Dict[str, jax.Array],
    n_heads: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Standard softmax SDPA over axis ``-2`` — the reference's unused
    ``MultiHeadAttention`` variant kept as an ablation op
    (`/root/reference/phyloformer/attention.py:53-91`).  Params as in
    :func:`scaled_linear_attention` but with ``wq/wk`` of shape ``(d, d)``.
    """
    d = x.shape[-1]
    hd = d // n_heads

    def split(t):
        return t.reshape(t.shape[:-1] + (n_heads, hd))

    q = split(x @ params["wq"] + params["bq"])  # (..., A, H, hd)
    k = split(x @ params["wk"] + params["bk"])
    v = split(x @ params["wv"] + params["bv"])
    logits = jnp.einsum("...ahe,...bhe->...hab", q, k) / jnp.sqrt(float(hd))
    if mask is not None:
        bias = jnp.where(mask[..., None, None, :], 0.0, -1e30)
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...hab,...bhe->...ahe", probs, v)
    out = out.reshape(out.shape[:-2] + (d,))
    return out @ params["wo"] + params["bo"]


def linear_kernel_attention(
    x: jax.Array,
    params: Dict[str, jax.Array],
    n_heads: int,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Vanilla linear-kernel attention with the ``Z`` denominator — the
    reference's unused ``LinearKernelAttention`` variant
    (`/root/reference/phyloformer/attention.py:94-140`), full head dims.
    """
    d = x.shape[-1]
    hd = d // n_heads

    def split(t):
        return t.reshape(t.shape[:-1] + (n_heads, hd))

    q = phi(split(x @ params["wq"] + params["bq"]))  # (..., A, H, hd)
    k = phi(split(x @ params["wk"] + params["bk"]))
    v = split(x @ params["wv"] + params["bv"])
    if mask is not None:
        m = mask[..., None, None].astype(q.dtype)
        q = q * m
        k = k * m
        v = v * m
    ktv = jnp.einsum("...ahe,...ahf->...hef", k, v)
    ksum = jnp.sum(k, axis=-3)  # (..., H, hd)
    z = 1.0 / (jnp.einsum("...ahe,...he->...ah", q, ksum) + eps)
    out = jnp.einsum("...ahe,...hef->...ahf", q, ktv) * z[..., None]
    out = out.reshape(out.shape[:-2] + (d,))
    return out @ params["wo"] + params["bo"]


def layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """LayerNorm over the channel (last) axis, torch-default eps=1e-5.

    The reference normalizes the channel dim via ``transpose(-1,-3)``
    sandwiches (`/root/reference/phyloformer/model.py:90-102`); with our
    channel-last layout it is a plain last-axis LN.
    """
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias
