"""`pf-bench accuracy-grid` (VERDICT r2 #8): the drift-envelope re-measurement
is one command.  On CPU the engine runs the fused kernels in interpret mode,
so this exercises the exact code path the TPU envelope check uses."""

import json

from phyloformer_tpu.bench.accuracy import check_rows, drift_grid
from phyloformer_tpu.bench.cli import main as bench_main

PF = "/root/reference/models/pf.ckpt"


def test_drift_grid_small_corner():
    rows = drift_grid(PF, grid=[(8, 16)], reps=1)
    assert len(rows) == 1
    r = rows[0]
    assert "error" not in r, r
    # interpret-mode fused vs XLA fp32 on CPU: small but nonzero drift
    assert r["rel"] < 1e-2
    ok, msg = check_rows(rows, max_rel=1e-2)
    assert ok, msg


def test_engine_selection_covers_largest_corner():
    """(200, 1000) must route the fast path through the pipeline with
    bfloat16 storage and check it against the sequential P-chunked
    full-fp32 oracle (round 5 — a genuine fp32-grade oracle at the bf16
    corner); fp32 corners keep fp32 storage and the XLA fp32 oracle where
    it fits."""
    import jax

    from phyloformer_tpu.bench.accuracy import DEFAULT_GRID, make_engines
    from phyloformer_tpu.models.params import PhyloformerConfig, init_params

    cfg = PhyloformerConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert (200, 1000) in DEFAULT_GRID
    want = {(50, 250): ("xla_fp32", "float32"),
            (100, 1000): ("xla_fp32", "float32"),
            (200, 250): ("fused_highest", "float32"),
            (200, 1000): ("fp32_chunked", "bfloat16")}
    for (n, l), (oname, act) in want.items():
        fast, _oracle, name = make_engines(params, cfg, n, l)
        assert name == oname, (n, l, name)
        assert fast.icfg.pipeline_act_dtype == act, (n, l)


def test_check_rows_flags_errors_and_gate():
    ok, msg = check_rows([{"n": 1, "L": 2, "error": "boom"}], 1.0)
    assert not ok and "boom" in msg
    ok, _ = check_rows([{"n": 8, "L": 16, "rel": 0.5, "oracle": "x"}], 0.01)
    assert not ok
    ok, _ = check_rows([], 0.01)
    assert not ok


def test_cli_accuracy_grid(capsys):
    rc = bench_main(["accuracy-grid", "--grid", "8x16", "--reps", "1",
                     "--weights", PF])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    row = json.loads(out[0])
    assert row["n"] == 8 and row["L"] == 16
    assert "worst rel drift" in out[-1]
