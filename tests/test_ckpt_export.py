"""Torch-checkpoint EXPORT interop: checkpoints we write must be consumed by
the reference PyTorch tooling byte-for-byte (`infer_alns.py:71-82`)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from phyloformer_tpu.io import load_pretrained
from phyloformer_tpu.io.ckpt_import import (
    params_from_state_dict,
    save_reference_checkpoint,
    state_dict_from_params,
)
from phyloformer_tpu.io.torch_pickle import load_reference_checkpoint

REF = "/root/reference"


def test_state_dict_roundtrip(tmp_path):
    """params -> reference state dict -> params is the identity, and the
    exported .ckpt round-trips through our torch-free reader."""
    params, cfg, _ = load_pretrained(f"{REF}/models/pf.ckpt")
    state = state_dict_from_params(params, cfg)
    # the reference schema: 161 tensors incl. the (1225, 50) seq2pair buffer
    ref_state, _ = load_reference_checkpoint(f"{REF}/models/pf.ckpt")
    assert set(state) == set(ref_state)
    assert state["model.seq2pair"].shape == (1225, 50)
    for k in state:
        assert state[k].shape == ref_state[k].shape, k
        np.testing.assert_array_equal(state[k], ref_state[k], err_msg=k)

    out = tmp_path / "exported.ckpt"
    save_reference_checkpoint(out, params, cfg)
    params2, cfg2, hparams2 = load_pretrained(out)
    assert cfg2 == cfg
    assert hparams2["nb_blocks"] == 6 and hparams2["embed_dim"] == 64
    flat1 = jax_flat(params)
    flat2 = jax_flat(params2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def jax_flat(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_reference_code_consumes_export(tmp_path, goldens_dir):
    """The ultimate interop check: torch.load + the REFERENCE model code
    (`/root/reference/phyloformer/model.py`) run an exported checkpoint and
    reproduce the recorded golden predictions (torch-only subprocess; torch
    and JAX deadlock in one process here)."""
    params, cfg, _ = load_pretrained(f"{REF}/models/pf.ckpt")
    out = tmp_path / "exported.ckpt"
    save_reference_checkpoint(out, params, cfg)

    g = np.load(goldens_dir / "pf_preds_testdata.npz")
    stem = "0_20_tips"
    expected = g[stem].astype(np.float32)

    script = f"""
import json, sys
sys.path.insert(0, {REF!r})
import numpy as np
import torch
ckpt = torch.load({str(out)!r}, map_location="cpu")
hp = ckpt["hyper_parameters"]
from phyloformer.model import Phyloformer
model = Phyloformer(n_blocks=hp["nb_blocks"], n_heads=hp["nb_heads"],
                    h_dim=hp["embed_dim"], dropout=hp["dropout"])
state = {{k[len("model."):]: v for k, v in ckpt["state_dict"].items()}}
state.pop("seq2pair", None)
missing, unexpected = model.load_state_dict(state, strict=False)
assert not unexpected, unexpected
assert missing in ([], ["seq2pair"]), missing
model.eval()
# reference one-hot load semantics without dendropy (data.py:7-31)
alphabet = b"ARNDCQEGHILKMFPSTWYVX-"
seqs = []
cur = None
for line in open({REF!r} + "/data/testdata/msas/{stem}.fa"):
    line = line.strip()
    if line.startswith(">"):
        cur = []
        seqs.append(cur)
    elif line:
        cur.extend(alphabet.index(c.encode()) for c in line)
x = torch.nn.functional.one_hot(torch.tensor(seqs), 22).permute(2, 1, 0).float()
with torch.no_grad():
    preds = model(x[None]).numpy()
print(json.dumps(preds.ravel().tolist()))
"""
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    preds = np.array(json.loads(r.stdout.strip().splitlines()[-1]), np.float32)
    assert preds.shape == expected.shape
    np.testing.assert_allclose(preds, expected, atol=2e-5)


def test_pf_ckpt_cli(tmp_path):
    from phyloformer_tpu.io.cli import main as ckpt_main

    out = tmp_path / "e.ckpt"
    assert ckpt_main(["export", f"{REF}/models/pf.ckpt", str(out)]) == 0
    npz = tmp_path / "p.npz"
    assert ckpt_main(["convert", str(out), str(npz)]) == 0
    assert ckpt_main(["inspect", str(npz)]) == 0
    params, cfg, _ = load_pretrained(out)
    assert cfg.n_blocks == 6


def test_orbax_train_output_exports(tmp_path):
    """The fine-tune workflow loop: our orbax training checkpoints export to
    a torch-readable reference .ckpt via pf-ckpt (torch verified in a
    subprocess; torch and JAX deadlock in-process here)."""
    import jax

    from phyloformer_tpu.io.checkpoint import CheckpointManager
    from phyloformer_tpu.io.cli import main as ckpt_main
    from phyloformer_tpu.models.params import PhyloformerConfig, init_params

    cfg = PhyloformerConfig(n_blocks=2, n_heads=4, embed_dim=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ckpt_dir = tmp_path / "checkpoints_run"
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(3, {"params": params},
             metadata={"config": {"n_blocks": 2, "n_heads": 4, "embed_dim": 64}})
    mgr.close()

    out = tmp_path / "exported.ckpt"
    assert ckpt_main(["export", str(ckpt_dir), str(out)]) == 0

    script = f"""
import torch
ckpt = torch.load({str(out)!r}, map_location="cpu", weights_only=True)
assert ckpt["hyper_parameters"]["nb_blocks"] == 2
assert ckpt["state_dict"]["model.embedding_block.0.weight"].shape == (64, 22, 1, 1)
assert ckpt["state_dict"]["model.attention_blocks.1.ffn.0.weight"].shape == (256, 64, 1, 1)
print("torch read ok")
"""
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "torch read ok" in r.stdout
