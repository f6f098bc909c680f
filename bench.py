"""Benchmark: coarse-stage molecule sampling throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config mirrors the driver baseline ("Coarse EDM sampler: 64 fragment
point-sets (<=12 nodes, 1000 steps)"): GEOM model size (hidden 256, 6 EGNN
layers, learned gamma), full 1000-step reverse process as one lax.scan.

vs_baseline divides by the measured reference throughput in
BASELINE_MEASURED.json (1000 sequential torch EGNN forwards at the same
config; scripts/measure_baseline.py) — reference hardware here is torch-CPU
since its GPU env is unavailable; see BASELINE.md for the caveat.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hierdiff_tpu.models import CoarseDiffusion
    from hierdiff_tpu.sampling import make_masks_for_counts, sample_coarse

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    max_n = 12
    timesteps = 1000

    model = CoarseDiffusion(in_node_nf=8, timesteps=timesteps, hidden_nf=256,
                            n_layers=6, inv_sublayers=2, noise_schedule="learned")
    rng = np.random.default_rng(0)
    counts = rng.integers(4, max_n + 1, size=batch_size)
    nm, em = make_masks_for_counts(counts, max_n)
    nm, em = jnp.asarray(nm), jnp.asarray(em)

    # init params via a dummy batch
    batch = {
        "positions": jnp.zeros((batch_size, max_n, 3)) * nm,
        "node_feature": jnp.zeros((batch_size, max_n, 8)) * nm,
        "atom_mask": nm, "edge_mask": em,
    }
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), train=True)

    # warmup / compile (two calls: the axon tunnel can report the first
    # post-compile call complete early; force host transfers when timing)
    for i in range(2):
        x, h = sample_coarse(model, params, jax.random.PRNGKey(2 + i), nm, em)
        np.asarray(x)

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        x, h = sample_coarse(model, params, jax.random.PRNGKey(10 + i), nm, em)
        np.asarray(x), np.asarray(h)
    dt = (time.perf_counter() - t0) / reps
    mols_per_sec = batch_size / dt

    base_file = Path(__file__).parent / "BASELINE_MEASURED.json"
    vs_baseline = 0.0
    if base_file.exists():
        base = json.loads(base_file.read_text())
        ref = base.get("ref_batch64_n12_T1000", {}).get("molecules_per_sec")
        if ref:
            vs_baseline = mols_per_sec / ref

    print(json.dumps({
        "metric": "coarse_sampling_molecules_per_sec_per_chip",
        "value": round(mols_per_sec, 3),
        "unit": f"molecules/sec/chip (1000-step EDM, batch {batch_size}, N<={max_n})",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
