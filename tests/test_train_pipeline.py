"""Data pipeline, checkpointing, and fit-loop tests (small, CPU-fast)."""

import json

import numpy as np
import pytest

from phyloformer_tpu.models import PhyloformerConfig
from phyloformer_tpu.train import TrainConfig
from phyloformer_tpu.train.data import (
    BucketedLoader,
    LoaderConfig,
    choose_data,
    make_pairs,
)

SMALL = PhyloformerConfig(n_blocks=1, n_heads=2, embed_dim=16)


@pytest.fixture()
def tiny_dataset(tmp_path):
    """4 simulated (tree, alignment) pairs with differing sizes."""
    from phyloformer_tpu.sim import MsaSimConfig, TreeSimConfig, simulate_msa, simulate_tree

    rng = np.random.default_rng(0)
    trees, alns = tmp_path / "trees", tmp_path / "msas"
    trees.mkdir(), alns.mkdir()
    for i, ntips in enumerate([6, 6, 8, 8]):
        t = simulate_tree(rng, TreeSimConfig(ntips=ntips))
        (trees / f"{i}_{ntips}_tips.nwk").write_text(t.to_newick() + "\n")
        ok, _ = simulate_msa(
            trees / f"{i}_{ntips}_tips.nwk",
            alns / f"{i}_{ntips}_tips.fa",
            MsaSimConfig(length=40, max_attempts=5),
            rng,
        )
        assert ok
    return trees, alns


def test_make_pairs_and_split(tiny_dataset):
    trees, alns = tiny_dataset
    pairs = make_pairs(trees, alns)
    assert len(pairs) == 4
    for t, a in pairs:
        assert t.endswith(".nwk") and a.endswith(".fa")

    filtered = make_pairs(trees, alns, regex="_8_tips")
    assert len(filtered) == 2

    train, val = choose_data(trees, alns, seed=1337)
    assert len(train) == 3 and len(val) == 1
    # deterministic given seed
    train2, val2 = choose_data(trees, alns, seed=1337)
    assert train == train2 and val == val2


def test_bucketed_loader_covers_everything(tiny_dataset):
    trees, alns = tiny_dataset
    pairs = make_pairs(trees, alns)
    loader = BucketedLoader(pairs, LoaderConfig(batch_size=2, n_buckets=(6, 8), l_buckets=(64,), num_workers=2))
    seen = 0
    for batch in loader:
        b, n, L = batch["codes"].shape
        assert L == 64
        assert batch["dists"].shape == (b, n * (n - 1) // 2)
        assert batch["site_mask"].shape == (b, 64)
        # padded targets are zero outside pair mask
        from phyloformer_tpu.models import pair_mask_from_seq_mask
        import jax.numpy as jnp

        pm = np.asarray(pair_mask_from_seq_mask(jnp.asarray(batch["seq_mask"]), n))
        assert (batch["dists"][~pm] == 0).all()
        assert (batch["dists"][pm] > 0).all()
        seen += b
    assert seen == 4


def test_loader_token_cap_shrinks_large_buckets(tiny_dataset):
    """max_batch_tokens caps the per-bucket batch (mixed-length corpora
    must shrink the batch on their largest buckets instead of OOMing)."""
    trees, alns = tiny_dataset
    pairs = make_pairs(trees, alns)
    cfg = LoaderConfig(batch_size=4, n_buckets=(6, 8), l_buckets=(64,),
                       num_workers=1,
                       max_batch_tokens=8 * 7 // 2 * 64)  # one 8-tip example
    assert cfg.bucket_batch_size(8, 64) == 1
    assert cfg.bucket_batch_size(6, 64) == 1  # 6x64 tokens < budget? 15*64
    cfg2 = LoaderConfig(batch_size=4, max_batch_tokens=None)
    assert cfg2.bucket_batch_size(200, 1024) == 4  # None = flat
    loader = BucketedLoader(pairs, cfg)
    for batch in loader:
        b, n, L = batch["codes"].shape
        assert b * n * (n - 1) // 2 * L <= cfg.max_batch_tokens


def test_loader_epoch_reshuffles(tiny_dataset):
    trees, alns = tiny_dataset
    pairs = make_pairs(trees, alns)
    loader = BucketedLoader(pairs, LoaderConfig(batch_size=4, num_workers=1))
    a = [b["codes"].shape for b in loader]
    b = [b["codes"].shape for b in loader]
    assert len(a) >= 1 and len(b) >= 1  # iterating twice works


def test_orbax_roundtrip(tmp_path):
    import jax

    from phyloformer_tpu.io.checkpoint import CheckpointManager
    from phyloformer_tpu.train import create_train_state

    state, _ = create_train_state(SMALL, TrainConfig())
    state_np = jax.tree_util.tree_map(np.asarray, state)
    mgr = CheckpointManager(tmp_path / "ckpts")
    mgr.save(5, state_np, metadata={"note": "hello"})
    assert mgr.latest_step() == 5
    restored, step = mgr.restore(template=state_np)
    assert step == 5
    for a, b in zip(jax.tree_util.tree_leaves(state_np), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.restore_metadata()["note"] == "hello"
    mgr.close()


def test_params_npz_roundtrip(tmp_path):
    import jax

    from phyloformer_tpu.io.checkpoint import load_params_npz, save_params_npz
    from phyloformer_tpu.models import init_params

    params = init_params(jax.random.PRNGKey(0), SMALL)
    save_params_npz(tmp_path / "p.npz", params)
    again = load_params_npz(tmp_path / "p.npz")
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(again)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_loop_divergence_stop(tiny_dataset, tmp_path):
    """Hard loss ceiling triggers the divergence early stop."""
    from phyloformer_tpu.train.loop import FitConfig, fit

    trees, alns = tiny_dataset
    pairs = make_pairs(trees, alns)
    loader = BucketedLoader(pairs, LoaderConfig(batch_size=2, num_workers=1))
    tcfg = TrainConfig(learning_rate=1e3, warmup_steps=1, total_steps=50)  # diverge
    fcfg = FitConfig(nb_epochs=2, max_steps=20, check_val_every=0,
                     hard_loss_ceiling=3.0, output_dir=str(tmp_path), run_name="div")
    summary = fit(SMALL, tcfg, fcfg, loader)
    assert "divergence" in summary["stop_reason"] or summary["steps"] <= 20


def test_fit_loop_runs_and_checkpoints(tiny_dataset, tmp_path):
    from phyloformer_tpu.train.loop import FitConfig, fit

    trees, alns = tiny_dataset
    pairs = make_pairs(trees, alns)
    loader = BucketedLoader(pairs, LoaderConfig(batch_size=2, num_workers=1))
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=50)
    fcfg = FitConfig(nb_epochs=1, max_steps=4, check_val_every=2,
                     output_dir=str(tmp_path), run_name="smoke")
    summary = fit(SMALL, tcfg, fcfg, loader, val_loader=loader)
    assert summary["steps"] >= 2
    # metrics logged
    lines = (tmp_path / "smoke_metrics.jsonl").read_text().strip().splitlines()
    recs = [json.loads(ln) for ln in lines]
    assert any("val_loss" in r for r in recs)
    # checkpoint exists and is restorable
    from phyloformer_tpu.io.checkpoint import CheckpointManager

    mgr = CheckpointManager(summary["checkpoint_dir"])
    assert mgr.latest_step() is not None
    mgr.close()


def test_profiler_trace(tmp_path):
    import pathlib

    import jax

    from phyloformer_tpu.data.pairs import n_pairs
    from phyloformer_tpu.train import create_train_state, make_train_step
    from phyloformer_tpu.train.profiling import profile_n_steps

    tcfg = TrainConfig(total_steps=20, warmup_steps=2)
    state, tx = create_train_state(SMALL, tcfg)
    step = make_train_step(SMALL, tcfg, tx)
    rng = np.random.default_rng(0)
    batch = {
        "codes": rng.integers(0, 22, (2, 6, 32)).astype(np.int32),
        "dists": rng.uniform(0.1, 1, (2, n_pairs(6))).astype(np.float32),
        "site_mask": np.ones((2, 32), bool),
        "seq_mask": np.ones((2, 6), bool),
    }
    state, logs = profile_n_steps(step, state, iter([batch] * 3), 3, tmp_path / "prof")
    assert np.isfinite(float(logs["train_loss"]))
    assert list(pathlib.Path(tmp_path / "prof").rglob("*.pb")) or list(
        pathlib.Path(tmp_path / "prof").rglob("*")
    )


def test_packed_dataset_roundtrip(tiny_dataset, tmp_path):
    """Preprocessed shards reproduce the parsed examples exactly, and the
    packed loader covers every example with the standard batch schema."""
    from phyloformer_tpu.train.data import load_example, make_pairs
    from phyloformer_tpu.train.packed import (
        PackedBucketedLoader,
        PackedDataset,
        preprocess,
    )

    trees, alns = tiny_dataset
    pairs = make_pairs(trees, alns)
    out = preprocess(pairs, tmp_path / "packed", shard_size=3)
    ds = PackedDataset(out)
    assert len(ds) == len(pairs)
    for i, (tree_path, aln_path) in enumerate(pairs):
        ref_aln, ref_vec = load_example(tree_path, aln_path)
        aln, vec = ds[i]
        np.testing.assert_array_equal(aln.codes, ref_aln.codes)
        np.testing.assert_allclose(vec, ref_vec, rtol=1e-6)

    loader = PackedBucketedLoader(
        ds, LoaderConfig(batch_size=2, n_buckets=(6, 8), l_buckets=(64,), num_workers=1)
    )
    seen = 0
    for batch in loader:
        assert set(batch) == {"codes", "dists", "site_mask", "seq_mask"}
        seen += batch["codes"].shape[0]
    assert seen == len(pairs)


def test_metric_sinks(tmp_path, capsys):
    """Optional metric sinks next to the JSONL writer: TensorBoard events are
    written (tensorboardX present in this image) and a missing wandb degrades
    to a warning + None (reference wandb-offline parity surface,
    train_distributed.py:363-369)."""
    from phyloformer_tpu.train.loop import (
        MetricLogger,
        make_tensorboard_sink,
        make_wandb_sink,
    )

    tb = make_tensorboard_sink(tmp_path / "tb")
    assert tb is not None
    logger = MetricLogger(tmp_path / "m.jsonl", sinks=[tb])
    logger.log(1, train_loss=0.5, learning_rate=1e-4)
    logger.log(2, train_loss=0.4, note="strings skipped by sinks")
    logger.close()
    events = list((tmp_path / "tb").glob("events.*"))
    assert events and events[0].stat().st_size > 0
    assert len((tmp_path / "m.jsonl").read_text().splitlines()) == 2

    import importlib.util
    if importlib.util.find_spec("wandb") is None:
        assert make_wandb_sink("P", "run", tmp_path) is None
        assert "wandb not installed" in capsys.readouterr().out
