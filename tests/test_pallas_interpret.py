"""Interpret-mode parity for the fused Pallas kernels (CPU CI).

tests/test_pallas.py validates the kernels on real TPU hardware (Mosaic
lowering + numerics); it cannot run in the default CPU suite. This file
pins the KERNEL MATH on every CI run by executing the same pallas_call
graphs through the interpreter — a math or tiling regression (wrong block
indexing, dropped mask, bad accumulation dtype) fails here without a chip.
Mosaic-lowering regressions still need the TPU suite.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture()
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def _inputs(b, n, h, key=0):
    rng = np.random.default_rng(key)
    hh = jnp.asarray(rng.standard_normal((b, n, h)), jnp.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((b, n, n, 2)), jnp.float32)
    em = jnp.asarray((rng.random((b, n, n, 1)) > 0.2), jnp.float32)
    nm = jnp.ones((b, n, 1), jnp.float32)
    return hh, x, e, em, nm


@pytest.mark.parametrize("cd", [None, "bfloat16"])
def test_fused_gcl_interpret_parity(interpret_pallas, cd):
    from hierdiff_tpu.ops.egnn import DenseGCL

    b, n, h = 4, 16, 64
    hh, x, e, em, nm = _inputs(b, n, h)
    gcl = DenseGCL(hidden_nf=h, normalization_factor=10.0, attention=True)
    params = gcl.init(jax.random.PRNGKey(0), hh, e, nm, em)
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(gcl.apply(params, hh, e, nm, em))
    plm = DenseGCL(hidden_nf=h, normalization_factor=10.0, attention=True,
                   use_pallas=True, compute_dtype=cd)
    out = np.asarray(plm.apply(params, hh, e, nm, em))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2, err  # kernel matmuls use bf16 operands by design


@pytest.mark.parametrize("cd", [None, "bfloat16"])
def test_fused_coord_interpret_parity(interpret_pallas, cd):
    from hierdiff_tpu.ops.egnn import DenseEquivariantUpdate, coord2diff_dense

    b, n, h = 4, 16, 64
    hh, x, e, em, nm = _inputs(b, n, h)
    _, cdiff = coord2diff_dense(x, norm_constant=0.0)
    equ = DenseEquivariantUpdate(hidden_nf=h, normalization_factor=10.0,
                                 tanh=True, coords_range=5.0)
    params = equ.init(jax.random.PRNGKey(1), hh, x, cdiff, e, nm, em)
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(equ.apply(params, hh, x, cdiff, e, nm, em))
    plm = DenseEquivariantUpdate(hidden_nf=h, normalization_factor=10.0,
                                 tanh=True, coords_range=5.0, use_pallas=True,
                                 compute_dtype=cd)
    out = np.asarray(plm.apply(params, hh, x, cdiff, e, nm, em))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2, err


def test_bf16_tiles_no_row_split_at_geom_buckets():
    """The dtype-aware budget must remove the row split (and with it the
    per-chunk dst-matmul recompute) at the production config H=256 for
    N<=48, and halve the chunk count at N=96."""
    from hierdiff_tpu.ops.egnn_pallas import _pick_tiles

    for n in (12, 24, 48):
        _, ci_f32 = _pick_tiles(256, n, 256, 4)
        _, ci_bf16 = _pick_tiles(256, n, 256, 2)
        assert ci_bf16 == n, (n, ci_bf16)
    _, ci_f32 = _pick_tiles(256, 96, 256, 4)
    _, ci_bf16 = _pick_tiles(256, 96, 256, 2)
    assert ci_bf16 >= 2 * ci_f32
