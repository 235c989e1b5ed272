"""Multi-chip scaling evidence: virtual-mesh weak scaling + comm model.

Two artifacts (BASELINE.md north star: >=85% scaling efficiency at 2 hosts):

1. **Weak-scaling measurement** on a virtual CPU mesh: fixed per-device
   batch, 1/2/4/8 devices (one subprocess each — device count is
   process-global).  On shared host cores absolute times are meaningless,
   but the partitioned XLA graph (gradient psum, pair-axis collectives) is
   the real one — this verifies the sharded step compiles, runs, and the
   per-device work stays constant.

2. **Analytic communication/compute model** from measured single-chip step
   times and exact collective byte counts (both printed), giving the
   defensible efficiency numbers for real hardware: the model is 308k
   params (1.2 MB fp32), so the DP gradient all-reduce moves ~2.5 MB/step
   — against a measured 262 ms step this is noise even over DCN.

Usage: python tools/scaling_bench.py            # orchestrates subprocesses
       python tools/scaling_bench.py worker N   # internal
"""

import json
import os
import subprocess
import sys
import time

# tiny shapes: the virtual devices all share the 2 host cores, so this
# measurement is a correctness/overhead probe, not a throughput one
PER_DEVICE_BATCH = 1
N, L = 16, 64
STEPS = 2


def worker(n_devices: int) -> None:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)

    from phyloformer_tpu.data.pairs import n_pairs
    from phyloformer_tpu.models import PhyloformerConfig
    from phyloformer_tpu.parallel import make_mesh, shard_batch
    from phyloformer_tpu.train import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    pair = 2 if n_devices >= 4 else 1
    mesh = make_mesh(data=n_devices // pair, pair=pair)
    cfg = PhyloformerConfig()
    tcfg = TrainConfig(total_steps=10, warmup_steps=2, shard_pairs=pair > 1)
    state, tx = create_train_state(cfg, tcfg)
    step = make_train_step(cfg, tcfg, tx, mesh=mesh)

    bsz = PER_DEVICE_BATCH * mesh.shape["data"]
    rng = np.random.default_rng(0)
    batch = {
        "codes": rng.integers(0, 22, (bsz, N, L)).astype(np.int32),
        "dists": rng.uniform(0.01, 2.0, (bsz, n_pairs(N))).astype(np.float32),
        "site_mask": np.ones((bsz, L), dtype=bool),
        "seq_mask": np.ones((bsz, N), dtype=bool),
    }
    batch = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(0)
    state, logs = step(state, batch, key)  # compile
    _ = float(logs["train_loss"])
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        state, logs = step(state, batch, key)
        _ = float(np.asarray(logs["train_loss"]))
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "devices": n_devices,
        "mesh": dict(mesh.shape),
        "global_batch": bsz,
        "median_step_s": float(np.median(times)),
        "loss": float(logs["train_loss"]),
    }))


def orchestrate() -> None:
    import numpy as np

    results = []
    for d in (1, 2, 4, 8):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker", str(d)],
            capture_output=True, text=True, timeout=1200,
        )
        if r.returncode != 0:
            print(f"devices={d} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        results.append(rec)
        print(f"devices={d} mesh={rec['mesh']} global_batch={rec['global_batch']} "
              f"step={rec['median_step_s']*1000:.0f} ms loss={rec['loss']:.4f}")

    # weak-scaling efficiency on the virtual mesh (informational only: all
    # virtual devices share the host cores, so ideal time GROWS linearly
    # with devices here; report per-example throughput instead)
    base = results[0]
    print("\nper-example step cost (virtual mesh, shared host cores):")
    for rec in results:
        per_ex = rec["median_step_s"] / rec["global_batch"]
        print(f"  devices={rec['devices']}: {per_ex*1000:.0f} ms/example "
              f"(x{per_ex / (base['median_step_s']/base['global_batch']):.2f} vs 1 device)")

    # ---- analytic model for real hardware ----
    params_mb = 308_449 * 4 / 1e6
    grad_allreduce_mb = 2 * params_mb  # ring all-reduce moves ~2x per member
    step_ms_chip = 262.0  # measured fused train step, batch 4, 50x256 (docs)
    ici_gbps, dcn_gbps = 45.0, 12.5  # v5e per-link ICI; conservative DCN/host
    t_ici = grad_allreduce_mb / 1e3 / ici_gbps * 1000
    t_dcn = grad_allreduce_mb / 1e3 / dcn_gbps * 1000
    print("\nanalytic DP scaling model (measured 262 ms/step, 308k params):")
    print(f"  grad all-reduce volume: {grad_allreduce_mb:.1f} MB/step")
    print(f"  over ICI ({ici_gbps} GB/s):  {t_ici:.3f} ms -> "
          f"efficiency {step_ms_chip/(step_ms_chip+t_ici)*100:.2f}%")
    print(f"  over DCN ({dcn_gbps} GB/s):  {t_dcn:.3f} ms -> "
          f"efficiency {step_ms_chip/(step_ms_chip+t_dcn)*100:.2f}% at 2 hosts")
    # pair-axis sharding comm: per block, the column stats (B, L, 3d) psum +
    # row-attention partial sums; dominated by colstats
    b_, l_, d_ = 4, 256, 64
    colstats_mb = b_ * l_ * 3 * d_ * 4 / 1e6 * 6  # 6 blocks
    print(f"  pair-axis psum volume (B=4, L=256): {colstats_mb:.2f} MB/step "
          f"-> {colstats_mb/1e3/ici_gbps*1000:.3f} ms over ICI")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        orchestrate()
