"""Worker for the two-process jax.distributed smoke test (run by
tests/test_multihost.py, one subprocess per simulated host).

Initializes the distributed runtime over localhost, forms the GLOBAL data
mesh via parallel.mesh.initialize_multihost, runs one real data-parallel
coarse train step with each process feeding its local batch shard, and
prints the resulting loss + grad-norm so the parent can assert both
processes agree (the gradient all-reduce crossed processes).

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import optax  # noqa: E402

from hierdiff_tpu.models import CoarseDiffusion  # noqa: E402
from hierdiff_tpu.parallel.mesh import batch_sharding, initialize_multihost  # noqa: E402
from hierdiff_tpu.parallel.train_step import TrainState, make_train_step  # noqa: E402
from hierdiff_tpu.sampling.coarse import make_masks_for_counts  # noqa: E402


def main():
    mesh = initialize_multihost(f"localhost:{port}", nproc, pid)
    n_global = len(jax.devices())
    assert n_global == 2 * nproc, f"expected {2 * nproc} global devices, got {n_global}"
    assert jax.process_count() == nproc

    model = CoarseDiffusion(in_node_nf=8, timesteps=10, hidden_nf=16, n_layers=1)

    def loss_fn(params, batch, rng):
        out = model.apply(params, batch, rng, train=True)
        return out["loss"], {}

    # global batch of 8 = 2 molecules per device; every process builds the
    # SAME deterministic global batch and feeds its local quarter
    b_global, n = 8, 6
    rng = np.random.default_rng(0)
    counts = np.full(b_global, n)
    nm, em = make_masks_for_counts(counts, n)
    batch_np = {
        "positions": (rng.standard_normal((b_global, n, 3)) * nm).astype(np.float32),
        "node_feature": (rng.standard_normal((b_global, n, 8)) * nm).astype(np.float32),
        "atom_mask": nm, "edge_mask": em,
    }
    bsh = batch_sharding(mesh)
    batch = {
        k: jax.make_array_from_process_local_data(
            bsh, v[pid * (b_global // nproc): (pid + 1) * (b_global // nproc)])
        for k, v in batch_np.items()
    }

    init_batch = {k: v[:2] for k, v in batch_np.items()}
    params = jax.jit(lambda r1, b, r2: model.init(r1, b, r2, train=True))(
        jax.random.PRNGKey(0), init_batch, jax.random.PRNGKey(1))
    state = TrainState.create(params, optax.adamw(1e-4))
    step = make_train_step(loss_fn, mesh=mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    print(f"RESULT {pid} loss={float(metrics['loss']):.6f} "
          f"gnorm={float(metrics['grad_norm']):.6f} devices={n_global}",
          flush=True)

    # sharded SAMPLING across processes: each process contributes its local
    # quarter of the global (8, n) masks, the lax.scan sampler runs
    # collective-free on every device (pinned single-process in
    # test_weak_scaling), and the allgathered result must be identical in
    # both processes — the DCN-growth generation path of SURVEY §2.5
    from jax.experimental import multihost_utils  # noqa: E402

    from hierdiff_tpu.sampling.coarse import sample_coarse  # noqa: E402

    nm_s = jax.make_array_from_process_local_data(
        bsh, nm[pid * (b_global // nproc): (pid + 1) * (b_global // nproc)])
    em_s = jax.make_array_from_process_local_data(
        bsh, em[pid * (b_global // nproc): (pid + 1) * (b_global // nproc)])
    x, h = sample_coarse(model, state.params, jax.random.PRNGKey(3), nm_s, em_s)
    xg = multihost_utils.process_allgather(x, tiled=True)
    hg = multihost_utils.process_allgather(h, tiled=True)
    assert xg.shape == (b_global, n, 3) and hg.shape == (b_global, n, 8)
    ok = int(np.isfinite(xg).all() and np.isfinite(hg).all())
    checksum = float(np.abs(xg).sum() + np.abs(hg).sum())
    print(f"SAMPLE {pid} ok={ok} checksum={checksum:.6e}", flush=True)


if __name__ == "__main__":
    main()
