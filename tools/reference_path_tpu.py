"""The reference pipeline's computational structure, measured on this chip.

A faithful JAX transcription of `/root/reference/infer_alns.py`'s execution
pattern — NOT our framework's path:

- serial, batch = 1 (`infer_alns.py:95-112`; its batched helper is dead code),
- one-hot ``(22, L, n)`` input + 1x1-conv embedding (`model.py:138-143`),
- the materialized ``(P, n)`` seq2pair MATMUL (`model.py:8-39,175`),
- channel-first ``(1, d, P, L)`` layout with the reference's
  transpose-sandwich LayerNorms and per-block permutes (`model.py:87-106`),
- fp32 torch-default math (TF32 matmul off in torch 2.x).

This is the strongest defensible same-hardware denominator for bench.py's
``vs_baseline``: it grants the reference XLA's fusion (a real torch/CUDA
port would be slower), runs on the same silicon, and measures rather than
guesses.  See BASELINE.md.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

N_TIPS, SEQ_LEN = 60, 250
N_ALIGNMENTS = 64

from phyloformer_tpu.io import load_pretrained  # noqa: E402


def seq2pair_matrix(n: int) -> np.ndarray:
    """The reference's (P, n) 0/1 pair-sum matrix (`model.py:8-18`)."""
    P = n * (n - 1) // 2
    m = np.zeros((P, n), np.float32)
    k = 0
    for i in range(n):
        for j in range(i + 1, n):
            m[k, i] = 1.0
            m[k, j] = 1.0
            k += 1
    return m


def reference_forward(params, onehot, s2p, n_heads=4):
    """(22, L, n) -> (P,) with the reference's op structure."""
    d = params["embed"]["w"].shape[1]

    def ln(x):  # channel axis is dim 1 of (1, d, P, L): transpose sandwich
        xt = jnp.swapaxes(x, 1, 3)  # (1, L, P, d)
        mu = jnp.mean(xt, axis=-1, keepdims=True)
        var = jnp.var(xt, axis=-1, keepdims=True)
        return jnp.swapaxes((xt - mu) * jax.lax.rsqrt(var + 1e-5), 1, 3)

    def ln_affine(x, scale, bias):
        xt = jnp.swapaxes(x, 1, 3)
        mu = jnp.mean(xt, axis=-1, keepdims=True)
        var = jnp.var(xt, axis=-1, keepdims=True)
        xt = (xt - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return jnp.swapaxes(xt, 1, 3)

    def attention(x_perm, attn, axis_len):
        # x_perm: (1, A, B_other, d) with attention over axis 1? The
        # reference permutes so the attended axis is -2 of (.., A, d).
        q = jax.nn.elu(x_perm @ attn["wq"] + attn["bq"]) + 1.0
        k = jax.nn.elu(x_perm @ attn["wk"] + attn["bk"]) + 1.0
        v = x_perm @ attn["wv"] + attn["bv"]
        q = q / jnp.mean(q, axis=-2, keepdims=True)
        k = k / jnp.sum(k, axis=-2, keepdims=True)
        hd = v.shape[-1] // n_heads
        vh = v.reshape(v.shape[:-1] + (n_heads, hd))
        ctx = jnp.einsum("...ah,...ahd->...hd", k, vh)
        out = jnp.einsum("...ah,...hd->...ahd", q, ctx)
        out = out.reshape(out.shape[:-2] + (v.shape[-1],))
        return out @ attn["wo"] + attn["bo"]

    # embedding: conv 1x1 over (1, 22, L, n) == matmul on channel dim
    x = jnp.transpose(onehot, (1, 2, 0))  # (L, n, 22)
    x = jax.nn.relu(x @ params["embed"]["w"] + params["embed"]["b"])  # (L,n,d)
    # seq2pair: (P, n) @ (L, n, d) -> (L, P, d), then to (1, d, P, L)
    x = jnp.einsum("pn,lnd->lpd", s2p, x)
    x = jnp.transpose(x, (2, 1, 0))[None]  # (1, d, P, L)

    for layer in params["layers"]:
        # row attention over sites: permute to (1, P, L, d)
        h = ln_affine(x, layer["row_norm"]["scale"], layer["row_norm"]["bias"])
        h = jnp.transpose(h, (0, 2, 3, 1))  # (1, P, L, d)
        h = attention(h, layer["row_attn"], h.shape[2])
        x = x + jnp.transpose(h, (0, 3, 1, 2))
        # col attention over pairs: permute to (1, L, P, d)
        h = ln_affine(x, layer["col_norm"]["scale"], layer["col_norm"]["bias"])
        h = jnp.transpose(h, (0, 3, 2, 1))  # (1, L, P, d)
        h = attention(h, layer["col_attn"], h.shape[2])
        x = x + jnp.transpose(h, (0, 3, 2, 1))
        # FFN (1x1 convs)
        h = ln_affine(x, layer["ffn_norm"]["scale"], layer["ffn_norm"]["bias"])
        h = jnp.transpose(h, (0, 2, 3, 1))
        h = jax.nn.gelu(h @ layer["ffn"]["w1"] + layer["ffn"]["b1"],
                        approximate=False)
        h = h @ layer["ffn"]["w2"] + layer["ffn"]["b2"]
        x = x + jnp.transpose(h, (0, 3, 1, 2))

    h = jnp.transpose(x, (0, 2, 3, 1))  # (1, P, L, d)
    h = jax.nn.softplus(h @ params["head"]["w"] + params["head"]["b"])[..., 0]
    return jnp.mean(h, axis=-1)[0]  # (P,)


def main():
    params, cfg, _ = load_pretrained("/root/reference/models/pf.ckpt")
    s2p = jnp.asarray(seq2pair_matrix(N_TIPS))
    rng = np.random.default_rng(0)

    fwd = jax.jit(lambda p, x: reference_forward(p, x, s2p))

    # fp32 like torch defaults (TF32 matmul off in torch 2.x)
    with jax.default_matmul_precision("float32"):
        onehots = []
        for _ in range(N_ALIGNMENTS):
            codes = rng.integers(0, 20, size=(N_TIPS, SEQ_LEN))
            oh = np.zeros((22, SEQ_LEN, N_TIPS), np.float32)
            oh[codes.T, np.arange(SEQ_LEN)[:, None],
               np.arange(N_TIPS)[None, :]] = 1.0
            onehots.append(oh)

        # warmup/compile
        out = np.asarray(fwd(params, jnp.asarray(onehots[0])))
        assert out.shape == (N_TIPS * (N_TIPS - 1) // 2,)

        # serial batch=1, H2D per alignment, D2H per alignment — the
        # reference's loop structure (`infer_alns.py:95-112`)
        t0 = time.perf_counter()
        for oh in onehots:
            preds = np.asarray(fwd(params, jnp.asarray(oh)))
        elapsed = time.perf_counter() - t0
    print(json.dumps({
        "structure": "reference (batch=1 serial, seq2pair matmul, fp32)",
        "device": str(jax.devices()),
        "aln_per_s": N_ALIGNMENTS / elapsed,
        "s_per_aln": elapsed / N_ALIGNMENTS,
        "n_alignments": N_ALIGNMENTS,
    }))


if __name__ == "__main__":
    main()
