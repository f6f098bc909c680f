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


def test_pick_tiles_row_chunk_mosaic_valid():
    """Mosaic rejects blocks whose second-to-last dim is neither a multiple
    of 8 nor the full array dim — the bwd kernel's 4x elem_bytes sizing hit
    this at bucket 96 (ci=12; measured compile failure, r4c sweep). Every
    (batch, bucket, elem_bytes) the train/sample paths can produce must
    yield a valid (tb, ci)."""
    from hierdiff_tpu.ops.egnn_pallas import _pick_tiles

    for b in (32, 64, 256, 1024):
        for n in (8, 12, 16, 20, 24, 32, 40, 48, 64, 96):
            for eb in (2, 4, 8, 16):
                tb, ci = _pick_tiles(b, n, 256, eb)
                assert b % tb == 0 and n % ci == 0, (b, n, eb, tb, ci)
                assert ci == n or ci % 8 == 0, (b, n, eb, tb, ci)


@pytest.mark.parametrize("cd", [None, "bfloat16"])
@pytest.mark.parametrize("attention", [True, False])
def test_gcl_vjp_interpret_grad_parity(interpret_pallas, cd, attention):
    """The fused custom-VJP backward (egnn_pallas.gcl_vjp /
    fused_gcl_bwd) matches XLA AD of the DenseGCL for every gradient:
    dh, d_edge_attr, and all weight/bias grads. Tolerance covers the
    kernel's bf16 matmul operands vs HIGHEST XLA (same bound as the
    forward parity tests)."""
    from hierdiff_tpu.ops import egnn_pallas as ep
    from hierdiff_tpu.ops.egnn import DenseGCL

    b, n, h = 4, 16, 64
    hh, x, e, em, nm = _inputs(b, n, h)
    gcl = DenseGCL(hidden_nf=h, normalization_factor=10.0,
                   attention=attention)
    variables = gcl.init(jax.random.PRNGKey(0), hh, e, nm, em)
    pp = variables["params"]
    kp = {"edge_in": {"w_src": pp["edge_in_w_src"],
                      "w_dst": pp["edge_in_w_dst"],
                      "w_e": pp["edge_in_w_e"], "bias": pp["edge_in_bias"]},
          "edge_out": {"kernel": pp["edge_out_kernel"],
                       "bias": pp["edge_out_bias"]},
          "node_in": {"kernel": pp["node_in_kernel"],
                      "bias": pp["node_in_bias"]},
          "node_out": {"kernel": pp["node_out_kernel"],
                       "bias": pp["node_out_bias"]}}
    if attention:
        kp["att"] = {"kernel": pp["att_kernel"], "bias": pp["att_bias"]}

    def loss_xla(hh, e, p):
        with jax.default_matmul_precision("highest"):
            out = gcl.apply(p, hh, e, nm, em)
        return jnp.sum(out * jnp.cos(out * 0.1))

    f = ep.gcl_vjp(10.0, attention, cd)

    def loss_pl(hh, e, p):
        out = f(hh, e, em, nm, p)
        return jnp.sum(out * jnp.cos(out * 0.1))

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(hh, e, variables)
    gp = jax.grad(loss_pl, argnums=(0, 1, 2))(hh, e, kp)

    def rel(a, ref):
        a, ref = np.asarray(a), np.asarray(ref)
        return np.abs(a - ref).max() / (np.abs(ref).max() + 1e-9)

    tol = 2e-2 if cd is None else 4e-2
    assert rel(gp[0], gx[0]) < tol, ("dh", rel(gp[0], gx[0]))
    assert rel(gp[1], gx[1]) < tol, ("de", rel(gp[1], gx[1]))
    gxp = gx[2]["params"]
    names = {"edge_in": {"w_src": "edge_in_w_src", "w_dst": "edge_in_w_dst",
                         "w_e": "edge_in_w_e", "bias": "edge_in_bias"},
             "edge_out": {"kernel": "edge_out_kernel",
                          "bias": "edge_out_bias"},
             "node_in": {"kernel": "node_in_kernel", "bias": "node_in_bias"},
             "node_out": {"kernel": "node_out_kernel",
                          "bias": "node_out_bias"}}
    if attention:
        names["att"] = {"kernel": "att_kernel", "bias": "att_bias"}
    for grp, sub in names.items():
        for k, flat in sub.items():
            err = rel(gp[2][grp][k], gxp[flat])
            assert err < tol, (grp, k, err)


def test_gcl_vjp_matches_fused_gcl_forward(interpret_pallas):
    """gcl_vjp's primal IS fused_gcl — no forward drift between the
    training and inference kernels."""
    from hierdiff_tpu.ops import egnn_pallas as ep
    from hierdiff_tpu.ops.egnn import DenseGCL

    b, n, h = 4, 16, 64
    hh, x, e, em, nm = _inputs(b, n, h)
    gcl = DenseGCL(hidden_nf=h, normalization_factor=10.0, attention=True)
    variables = gcl.init(jax.random.PRNGKey(0), hh, e, nm, em)
    pp = variables["params"]
    kp = {"edge_in": {"w_src": pp["edge_in_w_src"],
                      "w_dst": pp["edge_in_w_dst"],
                      "w_e": pp["edge_in_w_e"], "bias": pp["edge_in_bias"]},
          "edge_out": {"kernel": pp["edge_out_kernel"],
                       "bias": pp["edge_out_bias"]},
          "node_in": {"kernel": pp["node_in_kernel"],
                      "bias": pp["node_in_bias"]},
          "node_out": {"kernel": pp["node_out_kernel"],
                       "bias": pp["node_out_bias"]},
          "att": {"kernel": pp["att_kernel"], "bias": pp["att_bias"]}}
    a = ep.gcl_vjp(10.0, True, None)(hh, e, em, nm, kp)
    bb = ep.fused_gcl(hh, e, em, nm, kp, 10.0, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
