"""Benchmark harness: wall-clock + peak-RSS per pipeline stage.

Emits CSV rows in the schema consumed by the reference's figure script
(``execution_*.csv``: columns ``timer,marker,id,elapsed_sec,MaxRSS_kb`` —
`/root/reference/make_plots.py:166-190` sums ``elapsed_sec`` across a
pipeline's stages per ``id`` and takes max RSS).  The reference measured
stages externally with GNU ``time``; here the timers live in-process
(with ``block_until_ready`` for device work) so one run produces the whole
table, plus a separate model-load timer matching ``model_load_times.txt``
(`make_plots.py:1597-1599`).
"""

from __future__ import annotations

import contextlib
import csv
import resource
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator, List, Optional


def max_rss_kb() -> int:
    """Peak RSS of this process in kB (ru_maxrss is kB on Linux)."""
    return int(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)


@dataclass
class StageRecord:
    timer: str  # stage name, e.g. "inference", "fastme"
    marker: str  # method name, e.g. "PF", "PF_Base"
    id: str  # example id, e.g. "0_20_tips"
    elapsed_sec: float
    max_rss_kb: int


@dataclass
class BenchmarkRecorder:
    records: List[StageRecord] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, timer: str, marker: str, example_id: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records.append(
                StageRecord(
                    timer=timer,
                    marker=marker,
                    id=example_id,
                    elapsed_sec=time.perf_counter() - t0,
                    max_rss_kb=max_rss_kb(),
                )
            )

    def write_csv(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", newline="") as fh:
            writer = csv.writer(fh)
            writer.writerow(["timer", "marker", "id", "elapsed_sec", "MaxRSS_kb"])
            for r in self.records:
                writer.writerow(
                    [r.timer, r.marker, r.id, f"{r.elapsed_sec:.6f}", r.max_rss_kb]
                )

    def group_elapsed(self) -> dict:
        """Total elapsed per (marker, id) across stages — the reference's
        ``group_elapsed`` aggregation (`make_plots.py:166-190`)."""
        out: dict = {}
        for r in self.records:
            key = (r.marker, r.id)
            agg = out.setdefault(key, {"elapsed_sec": 0.0, "MaxRSS_kb": 0})
            agg["elapsed_sec"] += r.elapsed_sec
            agg["MaxRSS_kb"] = max(agg["MaxRSS_kb"], r.max_rss_kb)
        return out


def run_pipeline_benchmark(
    weights: str,
    alndir: str,
    out_csv: Optional[str] = None,
    marker: str = "PF",
    build_trees: bool = True,
    true_tree_dir: Optional[str] = None,
    engine_kwargs: Optional[dict] = None,
) -> dict:
    """Timed end-to-end pipeline: load model -> infer -> FastME trees
    [-> KF vs truth].  Returns summary dict; optionally writes the CSV."""
    import numpy as np

    from ..data.fasta import has_fasta_ext, read_fasta
    from ..data.phylip import vec_to_phylip
    from ..infer.engine import InferenceConfig, InferenceEngine
    from ..io.ckpt_import import load_pretrained

    rec = BenchmarkRecorder()

    with rec.stage("model_load", marker, "all"):
        params, cfg, _ = load_pretrained(weights)
        engine = InferenceEngine(params, cfg, InferenceConfig(**(engine_kwargs or {})))

    paths = sorted(p for p in Path(alndir).iterdir() if has_fasta_ext(p))
    alns = []
    with rec.stage("data_load", marker, "all"):
        alns = [read_fasta(p) for p in paths]

    with rec.stage("inference", marker, "all"):
        preds = engine.predict(alns)

    trees = {}
    if build_trees:
        from ..trees.native import build_tree_from_phylip

        for p, aln, vec in zip(paths, alns, preds):
            with rec.stage("fastme", marker, p.stem):
                _, phy = vec_to_phylip(vec.astype(np.float64), aln.ids)
                trees[p.stem] = build_tree_from_phylip(phy, "bme", True, True)

    summary = {
        "n_alignments": len(alns),
        "stages": rec.group_elapsed(),
        "max_rss_kb": max_rss_kb(),
    }
    if true_tree_dir and trees:
        from ..trees.native import compare_newick

        kfs = []
        for stem, nwk in trees.items():
            ref_path = Path(true_tree_dir) / f"{stem}.nwk"
            if ref_path.exists():
                with rec.stage("compare", marker, stem):
                    kfs.append(compare_newick(ref_path.read_text(), nwk).kf)
        if kfs:
            summary["mean_kf"] = float(np.mean(kfs))

    if out_csv:
        rec.write_csv(out_csv)
    return summary
