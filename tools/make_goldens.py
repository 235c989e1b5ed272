"""Generate golden parity fixtures from the reference PyTorch model.

Runs the *reference implementation* (via sys.path, not copied) on reference
test data and dumps per-stage activations + final predictions to
``tests/goldens/*.npz``.  torch-only process: never import jax here (torch and
XLA-CPU OpenMP runtimes deadlock when mixed in one process).

Usage: python tools/make_goldens.py
"""

import pathlib
import sys

import numpy as np
import torch

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")
OUT = REPO / "tests" / "goldens"

sys.path.insert(0, str(REFERENCE))
sys.path.insert(0, str(REPO))

from phyloformer.model import Phyloformer  # noqa: E402  (reference package)

from phyloformer_tpu.data import read_fasta  # noqa: E402  (torch-free)


def load_reference_model(ckpt_path):
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    model = Phyloformer(**ckpt["hyper_parameters"])
    model.load_state_dict(
        {
            k.replace("model.", ""): v
            for k, v in ckpt["state_dict"].items()
            if k != "model.seq2pair"
        },
        strict=False,
    )
    model.eval()
    return model


def dump_stages(model, aln, out_path):
    """Per-stage activations for one MSA (layout converted to channel-last)."""
    x = torch.tensor(aln.one_hot_ref_layout()[None]).float()  # (1,22,L,n)
    stages = {}
    with torch.no_grad():
        model._set_seq2pair(aln.n_seqs)
        emb = model.embedding_block(x)  # (1,d,L,n)
        stages["emb"] = emb.permute(0, 3, 2, 1).numpy()  # (1,n,L,d)
        h = torch.matmul(model.seq2pair, emb.transpose(-1, -2))  # (1,d,P,L)
        stages["pairs"] = h.permute(0, 2, 3, 1).numpy()  # (1,P,L,d)
        for i, blk in enumerate(model.attention_blocks):
            h = blk(h)
            # stride the pair axis to keep the fixture small; layout or
            # numerics bugs still show at full site/channel resolution
            stages[f"block{i}"] = h.permute(0, 2, 3, 1).numpy()[:, ::3]
        head = model.pwFNN(h)  # (1,1,P,L)
        stages["head"] = head[:, 0].numpy()  # (1,P,L)
        preds = torch.squeeze(torch.mean(head, dim=-1))
        stages["preds"] = preds.numpy()
    np.savez_compressed(out_path, **stages)
    return stages


def dump_all_preds(model, msa_dir, out_path):
    """Final predictions for every testdata MSA (the e2e parity target)."""
    arrays = {}
    for fa in sorted(msa_dir.glob("*.fa")):
        aln = read_fasta(fa)
        x = torch.tensor(aln.one_hot_ref_layout()[None]).float()
        with torch.no_grad():
            preds = model(x)
        arrays[fa.stem] = preds.numpy()
        arrays[fa.stem + "__ids"] = np.array(aln.ids)
    np.savez_compressed(out_path, **arrays)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    msa_dir = REFERENCE / "data" / "testdata" / "msas"

    model = load_reference_model(REFERENCE / "models" / "pf.ckpt")
    aln = read_fasta(msa_dir / "0_20_tips.fa")
    stages = dump_stages(model, aln, OUT / "pf_stages_0_20_tips.npz")
    print("stages:", {k: v.shape for k, v in stages.items()})

    dump_all_preds(model, msa_dir, OUT / "pf_preds_testdata.npz")
    print("wrote", OUT / "pf_preds_testdata.npz")

    # Predictions from every shipped checkpoint on one MSA (importer coverage).
    multi = {}
    for name in ["pf", "pf_base", "pf_indel", "pf_cherry", "pf_selreg"]:
        m = load_reference_model(REFERENCE / "models" / f"{name}.ckpt")
        with torch.no_grad():
            preds = m(torch.tensor(aln.one_hot_ref_layout()[None]).float())
        multi[name] = preds.numpy()
    np.savez_compressed(OUT / "all_ckpts_0_20_tips.npz", **multi)
    print("wrote", OUT / "all_ckpts_0_20_tips.npz")


if __name__ == "__main__":
    main()
