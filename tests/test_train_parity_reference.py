"""End-to-end loss-curve parity vs the reference trainer semantics.

The reference training step is: Phyloformer forward -> ``torch.nn.L1Loss``
-> Adam -> HF ``get_linear_schedule_with_warmup`` stepped per optimizer
step (`/root/reference/train_distributed.py:151-167,424-428`).  This test
pits our ``make_train_step`` against exactly that stack — the reference's
own model code + torch Adam + the HF scheduler, run in a torch-only
subprocess (torch and JAX deadlock in one process here) — from the same
init (our exported checkpoint), on the same batches in the same order,
and requires the per-step train losses to agree to fp tolerance for the
whole run.  A silent divergence in loss semantics, Adam hyperparameters,
schedule shape/off-by-one, or data ordering shows up as a growing gap.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from phyloformer_tpu.data.fasta import read_fasta
from phyloformer_tpu.data.newick import patristic_vector, read_newick
from phyloformer_tpu.io import load_pretrained
from phyloformer_tpu.io.ckpt_import import save_reference_checkpoint

REF = "/root/reference"

N_STEPS = 25
WARMUP = 6
LR = 1e-3
BATCH = 2
L_TRUNC = 100  # truncate sites: same inputs both sides, 6x faster torch step

TORCH_SCRIPT = r"""
import json, sys
sys.path.insert(0, {ref!r})
import numpy as np
import torch
from transformers import get_linear_schedule_with_warmup

data = np.load({npz!r})
codes, dists, order = data["codes"], data["dists"], data["order"]

ckpt = torch.load({ckpt!r}, map_location="cpu")
hp = ckpt["hyper_parameters"]
from phyloformer.model import Phyloformer
model = Phyloformer(n_blocks=hp["nb_blocks"], n_heads=hp["nb_heads"],
                    h_dim=hp["embed_dim"], dropout=hp["dropout"])
state = {{k[len("model."):]: v for k, v in ckpt["state_dict"].items()}}
state.pop("seq2pair", None)
model.load_state_dict(state, strict=False)
model.train()

# reference stack: hard-coded L1, Adam, HF linear warmup schedule stepped
# per optimizer step (train_distributed.py:151-159,428)
criterion = torch.nn.L1Loss()
opt = torch.optim.Adam(model.parameters(), lr={lr})
sched = get_linear_schedule_with_warmup(opt, {warmup}, {total})

losses = []
for step_ids in order:
    x = torch.nn.functional.one_hot(
        torch.tensor(codes[step_ids], dtype=torch.long), 22
    ).permute(0, 3, 2, 1).float()        # (B, 22, L, n) reference layout
    y = torch.tensor(dists[step_ids], dtype=torch.float32)
    opt.zero_grad()
    preds = model(x)
    loss = criterion(preds, y)
    loss.backward()
    opt.step()
    sched.step()
    losses.append(float(loss))
print(json.dumps(losses))
"""


@pytest.fixture(scope="module")
def corpus():
    """Five 20-tip testdata examples, sites truncated to L_TRUNC."""
    codes, dists = [], []
    for rep in range(5):
        stem = f"{rep}_20_tips"
        aln = read_fasta(f"{REF}/data/testdata/msas/{stem}.fa")
        vec = patristic_vector(
            read_newick(f"{REF}/data/testdata/trees/{stem}.nwk"), aln.ids
        )
        codes.append(aln.codes[:, :L_TRUNC])
        dists.append(vec)
    return np.stack(codes).astype(np.int32), np.stack(dists).astype(np.float32)


def _batch_order():
    rng = np.random.default_rng(7)
    order = []
    for _ in range(N_STEPS):
        order.append(rng.choice(5, size=BATCH, replace=False))
    return np.stack(order)


def test_loss_curve_matches_reference_trainer(corpus, tmp_path):
    codes, dists = corpus
    order = _batch_order()

    # shared init: the published PF weights, re-exported through our writer
    params, cfg, _ = load_pretrained(f"{REF}/models/pf.ckpt")
    ckpt = tmp_path / "init.ckpt"
    save_reference_checkpoint(ckpt, params, cfg)
    npz = tmp_path / "batches.npz"
    np.savez(npz, codes=codes, dists=dists, order=order)

    script = TORCH_SCRIPT.format(
        ref=REF, npz=str(npz), ckpt=str(ckpt), lr=LR, warmup=WARMUP,
        total=N_STEPS,
    )
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    ref_losses = np.array(json.loads(r.stdout.strip().splitlines()[-1]))

    # our trainer on the identical batches / init / schedule
    import jax

    from phyloformer_tpu.train import TrainConfig, create_train_state
    from phyloformer_tpu.train.trainer import make_train_step

    tcfg = TrainConfig(loss="mae", learning_rate=LR, warmup_steps=WARMUP,
                       total_steps=N_STEPS)
    state, tx = create_train_state(cfg, tcfg, params=params)
    step_fn = make_train_step(cfg, tcfg, tx)
    ours = []
    key = jax.random.PRNGKey(0)  # dropout is 0; key is unused entropy
    for step_ids in order:
        batch = {"codes": codes[step_ids], "dists": dists[step_ids]}
        state, logs = step_fn(state, batch, key)
        ours.append(float(logs["train_loss"]))
    ours = np.array(ours)

    # fp32 both sides, different op orders: agreement to ~1e-4 absolute on
    # every step of the run (losses are O(0.1)); any semantic divergence
    # (schedule off-by-one, Adam eps, loss scaling) is orders larger
    np.testing.assert_allclose(ours, ref_losses, atol=2e-4, rtol=2e-3)
    # and the optimizer must actually be moving (not a frozen-lr no-op)
    assert ref_losses[-1] != ref_losses[0]
