"""Training engine tests: losses, schedule, train step, overfit smoke,
distributed (virtual 8-device mesh) parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phyloformer_tpu.data.pairs import n_pairs
from phyloformer_tpu.models import PhyloformerConfig, init_params
from phyloformer_tpu.train import (
    TrainConfig,
    create_train_state,
    linear_warmup_decay,
    make_eval_step,
    make_train_step,
    metrics,
)

SMALL = PhyloformerConfig(n_blocks=2, n_heads=4, embed_dim=32)


def toy_batch(bsz=4, n=8, L=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "codes": rng.integers(0, 22, (bsz, n, L)).astype(np.int32),
        "dists": rng.uniform(0.05, 2.0, (bsz, n_pairs(n))).astype(np.float32),
        "site_mask": np.ones((bsz, L), dtype=bool),
        "seq_mask": np.ones((bsz, n), dtype=bool),
    }


def test_linear_warmup_decay_matches_hf_formula():
    sched = linear_warmup_decay(1e-4, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(5e-5)
    assert float(sched(10)) == pytest.approx(1e-4)
    assert float(sched(55)) == pytest.approx(1e-4 * (100 - 55) / 90)
    assert float(sched(100)) == pytest.approx(0.0)
    assert float(sched(150)) == pytest.approx(0.0)


def test_losses_mask_invariance():
    from phyloformer_tpu.train import mae_loss, mre_loss

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(0.1, 1, (3, 10)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 1, (3, 10)).astype(np.float32))
    full = np.ones((3, 10), bool)
    assert float(mae_loss(p, t)) == pytest.approx(float(mae_loss(p, t, jnp.asarray(full))))
    # masked-out entries must not affect the loss
    p2 = p.at[:, 5:].set(99.0)
    m = full.copy()
    m[:, 5:] = False
    assert float(mae_loss(p2, t, jnp.asarray(m))) == pytest.approx(
        float(mae_loss(p[:, :5], t[:, :5]))
    )
    assert float(mre_loss(p2, t, jnp.asarray(m))) == pytest.approx(
        float(mre_loss(p[:, :5], t[:, :5])), rel=1e-5
    )


def test_train_step_reduces_loss():
    tcfg = TrainConfig(learning_rate=3e-3, warmup_steps=5, total_steps=200)
    state, tx = create_train_state(SMALL, tcfg)
    step = make_train_step(SMALL, tcfg, tx)
    batch = toy_batch()
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        state, logs = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(logs["train_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::6]
    assert int(state["step"]) == 30
    assert np.isfinite(losses).all()


def test_grad_accum_matches_full_batch():
    """Two half-batch micro-steps with grad_accum=2 must apply the same
    parameter update as one full-batch step (optax.MultiSteps averages the
    accumulated gradients; each loss is itself a mean, so halves weigh
    equally)."""
    full = toy_batch(bsz=4)
    halves = [
        {k: v[:2] for k, v in full.items()},
        {k: v[2:] for k, v in full.items()},
    ]

    tcfg1 = TrainConfig(total_steps=100, warmup_steps=0, learning_rate=1e-3)
    state1, tx1 = create_train_state(SMALL, tcfg1)
    step1 = make_train_step(SMALL, tcfg1, tx1)
    state1, _ = step1(state1, full, jax.random.PRNGKey(0))

    tcfg2 = TrainConfig(total_steps=100, warmup_steps=0, learning_rate=1e-3,
                        grad_accum=2)
    state2, tx2 = create_train_state(SMALL, tcfg2)
    step2 = make_train_step(SMALL, tcfg2, tx2)
    for h in halves:
        state2, logs2 = step2(state2, h, jax.random.PRNGKey(0))

    for a, b in zip(
        jax.tree_util.tree_leaves(state1["params"]),
        jax.tree_util.tree_leaves(state2["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_eval_step_metrics():
    tcfg = TrainConfig()
    state, _ = create_train_state(SMALL, tcfg)
    ev = make_eval_step(SMALL, tcfg)
    out = ev(state["params"], toy_batch())
    for k in ("val_loss", "val_mae", "val_mre", "val_rmse"):
        assert k in out and np.isfinite(float(out[k]))


def test_distributed_step_matches_single_device():
    """dp x pair-sharded step on the 8-device mesh == single-device step."""
    from phyloformer_tpu.parallel import make_mesh, shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=5, total_steps=100,
                       shard_pairs=True)
    batch = toy_batch(bsz=8)

    state1, tx1 = create_train_state(SMALL, tcfg)
    step1 = make_train_step(SMALL, tcfg, tx1)
    state1, logs1 = step1(state1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(data=4, pair=2)
    state2, tx2 = create_train_state(SMALL, tcfg)
    step2 = make_train_step(SMALL, tcfg, tx2, mesh=mesh)
    state2, logs2 = step2(state2, shard_batch(mesh, batch), jax.random.PRNGKey(0))

    assert float(logs1["train_loss"]) == pytest.approx(
        float(logs2["train_loss"]), rel=1e-5
    )
    # parameters after one step must agree
    flat1 = jax.tree_util.tree_leaves(state1["params"])
    flat2 = jax.tree_util.tree_leaves(state2["params"])
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_metrics_shapes():
    p = jnp.ones((2, 5)) * 1.5
    t = jnp.ones((2, 5))
    m = metrics(p, t)
    assert float(m["mae"]) == pytest.approx(0.5)
    assert float(m["mre"]) == pytest.approx(0.5, rel=1e-6)


def test_fully_padded_batch_rows_give_finite_gradients():
    """Regression: fully-masked (mesh-padding) rows used to produce NaN
    gradients through the attention normalizations (0/0 masked in the loss
    but poisoning backward)."""
    from phyloformer_tpu.train.trainer import pad_batch_to_multiple

    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    state, tx = create_train_state(SMALL, tcfg)
    step = make_train_step(SMALL, tcfg, tx)
    batch = pad_batch_to_multiple(toy_batch(bsz=3), 8)
    assert batch["codes"].shape[0] == 8
    assert not batch["seq_mask"][3:].any()
    state, logs = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["train_loss"]))
    assert np.isfinite(float(logs["grad_norm"])), "NaN gradients from padded rows"


def test_pallas_train_step_matches_xla():
    """use_pallas training (fused fwd + remat bwd) == XLA training step."""
    tcfg_x = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=50)
    tcfg_p = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=50,
                         use_pallas=True)
    cfg = PhyloformerConfig(n_blocks=2, n_heads=4, embed_dim=32)
    batch = toy_batch(bsz=2, n=7, L=24)

    s1, tx1 = create_train_state(cfg, tcfg_x)
    s2, tx2 = create_train_state(cfg, tcfg_p)
    step1 = make_train_step(cfg, tcfg_x, tx1)
    step2 = make_train_step(cfg, tcfg_p, tx2)
    s1, l1 = step1(s1, batch, jax.random.PRNGKey(0))
    s2, l2 = step2(s2, batch, jax.random.PRNGKey(0))
    assert float(l1["train_loss"]) == pytest.approx(float(l2["train_loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_fused_train_step_matches_unsharded():
    """Multi-chip fused training (shard_map + manual backward over the
    Pallas kernels, pair axis sharded) == the plain XLA training step."""
    from phyloformer_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = PhyloformerConfig(n_blocks=2, n_heads=4, embed_dim=32)
    mesh = make_mesh(data=2, pair=4)
    tcfg_x = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=50)
    tcfg_s = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=50,
                         use_pallas=True, shard_pairs=True)
    batch = toy_batch(bsz=2, n=11, L=40)  # P=55 -> one padding pair/shard

    s1, tx1 = create_train_state(cfg, tcfg_x)
    s2, tx2 = create_train_state(cfg, tcfg_s)
    step1 = make_train_step(cfg, tcfg_x, tx1)
    step2 = make_train_step(cfg, tcfg_s, tx2, mesh=mesh)
    from phyloformer_tpu.parallel.mesh import shard_batch

    s1, l1 = step1(s1, batch, jax.random.PRNGKey(0))
    s2, l2 = step2(s2, shard_batch(mesh, batch), jax.random.PRNGKey(0))
    assert float(l1["train_loss"]) == pytest.approx(float(l2["train_loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
