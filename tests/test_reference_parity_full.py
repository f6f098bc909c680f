"""FULL-MODEL golden parity vs the torch reference (round-1 VERDICT item 2).

Round 1 proved single-layer parity (GCL / EquivariantUpdate / E_GCL). These
tests load the reference's complete torch models from the read-only mount,
copy their weights into our JAX modules, feed identical inputs, and compare
end-to-end outputs and losses:

- full 6-block EGNN            (endiffusion/models/layers/egnn_new.py:155-205)
- EGNN_dynamics_QM9._forward   (endiffusion/models/module/en_dynamics.py:49)
- Edge_denoise.forward, all four heads + losses (models/edge_denoise.py:61-234)
- Node2Vec.forward             (models/model_refine.py:73-111)
- DiffusionQM9 gamma/loss algebra (endiffusion/train_module/diffusion_qm9.py:530-699)

RDKit / pytorch_lightning / hydra are unavailable here; the reference modules
are imported with inert stubs for those names — none of the compared code
paths touch them. This is the strongest quality proof available in this
environment (real-data training requires RDKit).
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference mount missing")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t2n(t):
    return np.asarray(t.detach().numpy())


_REGISTERED = set()     # stub/reference names _mod and _load put in sys.modules


def _mod(name, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []          # mark as package so submodule imports resolve
    for k, v in attrs.items():
        setattr(m, k, v)
    if name not in sys.modules:
        sys.modules[name] = m
        _REGISTERED.add(name)
    return sys.modules[name]


def _load(rel, name):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    _REGISTERED.add(name)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Reference modules with inert stubs for rdkit/PL/hydra/jtnn.

    The stubs are removed again at teardown: a leftover `rdkit` stub in
    sys.modules makes a later fresh `hierdiff_tpu.chem` import conclude
    HAS_RDKIT=True and build real assembly gates against MolFromSmiles
    stubs that return None (seen as a test-order failure in
    test_staged_cli when this module ran first)."""
    try:
        yield _build_ref()
    finally:
        for name in list(_REGISTERED):
            sys.modules.pop(name, None)
        _REGISTERED.clear()


def _build_ref():
    # rdkit stubs (never exercised by the compared paths)
    chem = _mod("rdkit.Chem", QED=None, Descriptors=None, RDConfig=None,
                rdMolDescriptors=None, MolFromSmiles=lambda s: None)
    _mod("rdkit", Chem=chem, RDLogger=types.SimpleNamespace(
        logger=lambda: types.SimpleNamespace(setLevel=lambda *a: None),
        CRITICAL=0))
    _mod("rdkit.Chem.AllChem")
    chem.AllChem = sys.modules["rdkit.Chem.AllChem"]
    # fine-stage package layout (stubs BEFORE the modules that import them)
    _mod("data_utils")
    _mod("data_utils.mol_tree", MolTree=object, MolTreeNode=object, Vocab=object)
    _load("data_utils/data_diffuse.py", "data_utils.data_diffuse")
    _load("data_utils/MPNN_pattern.py", "data_utils.MPNN_pattern")
    _mod("models")
    _mod("models.egnn")
    _load("models/egnn/utils.py", "models.egnn.utils")
    _load("models/egnn/gcl.py", "models.egnn.gcl")
    _load("models/egnn/egnn_new.py", "models.egnn.egnn_new")
    _mod("models.flows")
    _load("models/flows/utils.py", "models.flows.utils")
    ns = types.SimpleNamespace()
    ns.edge_denoise = _load("models/edge_denoise.py", "models.edge_denoise")
    ns.collate = _load("data_utils/dataset_denoise.py", "ref_dataset_denoise")
    # refine model (stub jtnn can_assemble — sampling-only)
    _mod("generation")
    _mod("generation.jtnn")
    _mod("generation.jtnn.jtnn_dec", can_assemble=lambda *a, **k: True)
    ns.model_refine = _load("models/model_refine.py", "models.model_refine")
    # endiffusion side (shares the "models" namespace with distinct submodules)
    ns.egnn_new = _load("endiffusion/models/layers/egnn_new.py", "models.layers.egnn_new")
    _mod("models.layers", egnn_new=ns.egnn_new)
    ns.en_utils = _load("endiffusion/models/utils.py", "models.utils")
    ns.noise_model = _load("endiffusion/models/noise_model.py", "models.noise_model")
    _mod("models.module")
    ns.dynamics = _load("endiffusion/models/module/en_dynamics.py", "models.module.en_dynamics")
    _mod("equivariant_diffusion")
    _load("endiffusion/equivariant_diffusion/utils.py", "equivariant_diffusion.utils")
    ns.criterion = _load("endiffusion/loss/criterion.py", "loss.criterion")
    _mod("loss", criterion=ns.criterion)
    # DiffusionQM9's module-level imports (PL/hydra never exercised by the
    # compared loss path)
    class _PLModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

    _mod("pytorch_lightning", LightningModule=_PLModule)
    _mod("hydra")
    _mod("hydra.utils", instantiate=None)
    sys.modules["hydra"].utils = sys.modules["hydra.utils"]
    _mod("dataset")
    _load("endiffusion/dataset/datasets_statistics.py", "dataset.datasets_statistics")
    _load("endiffusion/models/distributions.py", "models.distributions")
    ns.diffusion = _load("endiffusion/train_module/diffusion_qm9.py",
                         "train_module.diffusion_qm9")
    return ns


class AttrDict(dict):
    """Minimal easydict stand-in: attribute + item access."""

    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


# --------------------------------------------------------------------------
# weight copiers: torch reference -> our raw flax param dicts
# --------------------------------------------------------------------------


def copy_linear(lin):
    p = {"kernel": jnp.asarray(t2n(lin.weight).T)}
    if lin.bias is not None:
        p["bias"] = jnp.asarray(t2n(lin.bias))
    return p


def copy_coarse_gcl(gcl_t, H):
    """endiffusion GCL -> DenseGCL raw params (decomposed pair-linear)."""
    w0 = t2n(gcl_t.edge_mlp[0].weight)
    p = {
        "edge_in_w_src": jnp.asarray(w0[:, :H].T),
        "edge_in_w_dst": jnp.asarray(w0[:, H:2 * H].T),
        "edge_in_w_e": jnp.asarray(w0[:, 2 * H:].T),
        "edge_in_bias": jnp.asarray(t2n(gcl_t.edge_mlp[0].bias)),
        "edge_out_kernel": jnp.asarray(t2n(gcl_t.edge_mlp[2].weight).T),
        "edge_out_bias": jnp.asarray(t2n(gcl_t.edge_mlp[2].bias)),
        "node_in_kernel": jnp.asarray(t2n(gcl_t.node_mlp[0].weight).T),
        "node_in_bias": jnp.asarray(t2n(gcl_t.node_mlp[0].bias)),
        "node_out_kernel": jnp.asarray(t2n(gcl_t.node_mlp[2].weight).T),
        "node_out_bias": jnp.asarray(t2n(gcl_t.node_mlp[2].bias)),
    }
    if hasattr(gcl_t, "att_mlp"):
        p["att_kernel"] = jnp.asarray(t2n(gcl_t.att_mlp[0].weight).T)
        p["att_bias"] = jnp.asarray(t2n(gcl_t.att_mlp[0].bias))
    return p


def copy_equiv_update(upd_t, H):
    w0 = t2n(upd_t.coord_mlp[0].weight)
    return {
        "coord_in_w_src": jnp.asarray(w0[:, :H].T),
        "coord_in_w_dst": jnp.asarray(w0[:, H:2 * H].T),
        "coord_in_w_e": jnp.asarray(w0[:, 2 * H:].T),
        "coord_in_bias": jnp.asarray(t2n(upd_t.coord_mlp[0].bias)),
        "coord_mid_kernel": jnp.asarray(t2n(upd_t.coord_mlp[2].weight).T),
        "coord_mid_bias": jnp.asarray(t2n(upd_t.coord_mlp[2].bias)),
        "coord_head_kernel": jnp.asarray(t2n(upd_t.coord_mlp[4].weight).T),
    }


def copy_full_egnn(egnn_t, H, n_layers, inv_sublayers):
    p = {"embedding": copy_linear(egnn_t.embedding),
         "embedding_out": copy_linear(egnn_t.embedding_out)}
    for i in range(n_layers):
        blk = egnn_t._modules[f"e_block_{i}"]
        bp = {}
        for j in range(inv_sublayers):
            bp[f"gcl_{j}"] = copy_coarse_gcl(blk._modules[f"gcl_{j}"], H)
        bp["gcl_equiv"] = copy_equiv_update(blk._modules["gcl_equiv"], H)
        p[f"e_block_{i}"] = bp
    return p


def copy_fine_egcl(gcl_t, H, edges_in_d):
    """fine-stage E_GCL -> DenseEGCL params (nn.Dense children)."""
    w0 = t2n(gcl_t.mes_mlp[0].weight)  # (H, 2H + 1 + edges_in_d)
    p = {
        "mes_src": {"kernel": jnp.asarray(w0[:, :H].T),
                    "bias": jnp.asarray(t2n(gcl_t.mes_mlp[0].bias))},
        "mes_dst": {"kernel": jnp.asarray(w0[:, H:2 * H].T)},
        "mes_rad": {"kernel": jnp.asarray(w0[:, 2 * H:2 * H + 1].T)},
        "mes_out": copy_linear(gcl_t.mes_mlp[2]),
        "node_in": copy_linear(gcl_t.node_mlp[0]),
        "node_out": copy_linear(gcl_t.node_mlp[2]),
        "coord_in": copy_linear(gcl_t.coord_mlp[0]),
        "coord_head": {"kernel": jnp.asarray(t2n(gcl_t.coord_mlp[2].weight).T)},
    }
    if edges_in_d > 0:
        p["mes_e"] = {"kernel": jnp.asarray(w0[:, 2 * H + 1:].T)}
    if hasattr(gcl_t, "att_mlp"):
        p["att"] = copy_linear(gcl_t.att_mlp[0])
    if gcl_t.edge_update:
        p["edge_in"] = copy_linear(gcl_t.edge_mlp[0])
        p["edge_out"] = copy_linear(gcl_t.edge_mlp[2])
    return p


def copy_sequential_head(seq, dense_indices=(0, 2)):
    """torch Sequential(Linear, act, Linear[, act]) -> flax nn.Sequential."""
    return {f"layers_{i}": copy_linear(seq[i]) for i in dense_indices}


def fully_connected_edges(n, b):
    rows, cols = [], []
    for k in range(b):
        for i in range(n):
            for j in range(n):
                rows.append(i + k * n)
                cols.append(j + k * n)
    return [torch.LongTensor(rows), torch.LongTensor(cols)]


def masked_batch(b, n, h_nf, counts, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((b, n, h_nf)).astype(np.float32)
    x = rng.standard_normal((b, n, 3)).astype(np.float32)
    node_mask = np.zeros((b, n, 1), np.float32)
    edge_mask = np.zeros((b, n, n), np.float32)
    for i, c in enumerate(counts):
        node_mask[i, :c] = 1
        edge_mask[i, :c, :c] = 1 - np.eye(c)
    return h * node_mask, x * node_mask, node_mask, edge_mask


# --------------------------------------------------------------------------
# 1. full EGNN (6 blocks x 2 sublayers, live config shape)
# --------------------------------------------------------------------------


def test_full_egnn_parity(ref):
    from hierdiff_tpu.ops.egnn import DenseEGNN

    torch.manual_seed(0)
    H, B, N, IN, LAYERS, SUB = 32, 2, 6, 9, 3, 2
    egnn_t = ref.egnn_new.EGNN(
        in_node_nf=IN, in_edge_nf=1, hidden_nf=H, n_layers=LAYERS,
        attention=True, tanh=True, coords_range=30, norm_constant=0,
        inv_sublayers=SUB, sin_embedding=False,
        normalization_factor=10, aggregation_method="sum")
    egnn_t.eval()

    h, x, node_mask, edge_mask = masked_batch(B, N, IN, [5, 6])
    edges = fully_connected_edges(N, B)
    with torch.no_grad():
        h_ref, x_ref = egnn_t(
            torch.tensor(h.reshape(B * N, IN)), torch.tensor(x.reshape(B * N, 3)),
            edges, node_mask=torch.tensor(node_mask.reshape(B * N, 1)),
            edge_mask=torch.tensor(edge_mask.reshape(B * N * N, 1)))
    h_ref = t2n(h_ref).reshape(B, N, IN)
    x_ref = t2n(x_ref).reshape(B, N, 3)

    ours = DenseEGNN(hidden_nf=H, out_node_nf=IN, n_layers=LAYERS,
                     inv_sublayers=SUB, attention=True, tanh=True,
                     coords_range=30.0, norm_constant=0.0,
                     normalization_factor=10.0, aggregation_method="sum")
    params = {"params": copy_full_egnn(egnn_t, H, LAYERS, SUB)}
    with jax.default_matmul_precision("highest"):
        h_out, x_out = ours.apply(params, jnp.asarray(h), jnp.asarray(x),
                                  jnp.asarray(node_mask), jnp.asarray(edge_mask[..., None]))
    np.testing.assert_allclose(np.asarray(h_out), h_ref, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(x_out), x_ref, atol=5e-4, rtol=5e-4)


# --------------------------------------------------------------------------
# 2. EGNN_dynamics_QM9._forward
# --------------------------------------------------------------------------


def test_dynamics_forward_parity(ref):
    from hierdiff_tpu.models.dynamics import EGNNDynamics

    torch.manual_seed(1)
    H, B, N, FEAT, LAYERS, SUB = 32, 2, 6, 8, 2, 2
    dyn_t = ref.dynamics.EGNN_dynamics_QM9(
        in_node_nf=FEAT + 1, context_node_nf=0, n_dims=3, hidden_nf=H,
        n_layers=LAYERS, attention=True, tanh=True, norm_constant=0,
        inv_sublayers=SUB, sin_embedding=False, normalization_factor=10,
        aggregation_method="sum", condition_time=True)
    dyn_t.eval()

    _, x, node_mask, edge_mask = masked_batch(B, N, FEAT, [5, 6], seed=3)
    rng = np.random.default_rng(4)
    feats = (rng.standard_normal((B, N, FEAT)).astype(np.float32)) * node_mask
    xh = np.concatenate([x, feats], axis=2)
    t = np.array([[0.3], [0.7]], np.float32)

    with torch.no_grad():
        # reference asserts use ~node_mask -> the mask must be boolean
        out_ref = dyn_t._forward(torch.tensor(t), torch.tensor(xh),
                                 torch.tensor(node_mask).bool(),
                                 torch.tensor(edge_mask), context=None)
    out_ref = t2n(out_ref)

    # ours counts in_node_nf EXCLUDING the time channel; the reference's
    # constructor arg includes it (diffusion_qm9.py:89-90 passes feat+1)
    ours = EGNNDynamics(in_node_nf=FEAT, hidden_nf=H, n_layers=LAYERS,
                        inv_sublayers=SUB, attention=True, tanh=True,
                        coords_range=30.0, norm_constant=0.0,
                        normalization_factor=10.0, condition_time=True)
    params = {"params": {"egnn": copy_full_egnn(dyn_t.egnn, H, LAYERS, SUB)}}
    with jax.default_matmul_precision("highest"):
        out = ours.apply(params, jnp.asarray(t), jnp.asarray(xh),
                         jnp.asarray(node_mask), jnp.asarray(edge_mask))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-4, rtol=5e-4)


def test_full_egnn_sin_embedding_parity(ref):
    """EGNN with sin_embedding=True (egnn_new.py:245-258 SinusoidsEmbeddingNew,
    conf knob ddpmgblur.yaml:35): top-level distances embedded once, per-block
    distances embedded before the concat — 24 edge-feature dims."""
    from hierdiff_tpu.ops.egnn import DenseEGNN

    torch.manual_seed(5)
    H, B, N, IN, LAYERS, SUB = 32, 2, 6, 9, 2, 2
    egnn_t = ref.egnn_new.EGNN(
        in_node_nf=IN, in_edge_nf=1, hidden_nf=H, n_layers=LAYERS,
        attention=True, tanh=True, coords_range=30, norm_constant=0,
        inv_sublayers=SUB, sin_embedding=True,
        normalization_factor=10, aggregation_method="sum")
    egnn_t.eval()

    h, x, node_mask, edge_mask = masked_batch(B, N, IN, [5, 6], seed=6)
    edges = fully_connected_edges(N, B)
    with torch.no_grad():
        h_ref, x_ref = egnn_t(
            torch.tensor(h.reshape(B * N, IN)), torch.tensor(x.reshape(B * N, 3)),
            edges, node_mask=torch.tensor(node_mask.reshape(B * N, 1)),
            edge_mask=torch.tensor(edge_mask.reshape(B * N * N, 1)))
    h_ref = t2n(h_ref).reshape(B, N, IN)
    x_ref = t2n(x_ref).reshape(B, N, 3)

    ours = DenseEGNN(hidden_nf=H, out_node_nf=IN, n_layers=LAYERS,
                     inv_sublayers=SUB, attention=True, tanh=True,
                     coords_range=30.0, norm_constant=0.0,
                     normalization_factor=10.0, aggregation_method="sum",
                     sin_embedding=True)
    params = {"params": copy_full_egnn(egnn_t, H, LAYERS, SUB)}
    with jax.default_matmul_precision("highest"):
        h_out, x_out = ours.apply(params, jnp.asarray(h), jnp.asarray(x),
                                  jnp.asarray(node_mask), jnp.asarray(edge_mask[..., None]))
    np.testing.assert_allclose(np.asarray(h_out), h_ref, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(x_out), x_ref, atol=5e-4, rtol=5e-4)


def copy_gnn(gnn_t, H, n_layers):
    p = {"embedding": copy_linear(gnn_t.embedding),
         "embedding_out": copy_linear(gnn_t.embedding_out)}
    for i in range(n_layers):
        p[f"gcl_{i}"] = copy_coarse_gcl(gnn_t._modules[f"gcl_{i}"], H)
    return p


def test_gnn_dynamics_forward_parity(ref):
    """mode='gnn_dynamics' (en_dynamics.py:25-30,90-94 / egnn_new.py:208-242):
    plain GNN over [x, h] node features, no edge mask (self-edges and padded
    pairs aggregate, matching the reference's unmasked scatter)."""
    from hierdiff_tpu.models.dynamics import EGNNDynamics

    torch.manual_seed(7)
    H, B, N, FEAT, LAYERS = 32, 2, 6, 8, 3
    dyn_t = ref.dynamics.EGNN_dynamics_QM9(
        in_node_nf=FEAT + 1, context_node_nf=0, n_dims=3, hidden_nf=H,
        n_layers=LAYERS, attention=False, mode="gnn_dynamics",
        normalization_factor=10, aggregation_method="sum",
        condition_time=True)
    dyn_t.eval()

    _, x, node_mask, edge_mask = masked_batch(B, N, FEAT, [5, 6], seed=8)
    rng = np.random.default_rng(9)
    feats = (rng.standard_normal((B, N, FEAT)).astype(np.float32)) * node_mask
    xh = np.concatenate([x, feats], axis=2)
    t = np.array([[0.3], [0.7]], np.float32)

    with torch.no_grad():
        out_ref = dyn_t._forward(torch.tensor(t), torch.tensor(xh),
                                 torch.tensor(node_mask).bool(),
                                 torch.tensor(edge_mask), context=None)
    out_ref = t2n(out_ref)

    ours = EGNNDynamics(in_node_nf=FEAT, hidden_nf=H, n_layers=LAYERS,
                        attention=False, normalization_factor=10.0,
                        condition_time=True, mode="gnn_dynamics")
    params = {"params": {"gnn": copy_gnn(dyn_t.gnn, H, LAYERS)}}
    with jax.default_matmul_precision("highest"):
        out = ours.apply(params, jnp.asarray(t), jnp.asarray(xh),
                         jnp.asarray(node_mask), jnp.asarray(edge_mask))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-4, rtol=5e-4)


# --------------------------------------------------------------------------
# 3. Edge_denoise full forward: all four heads + losses
# --------------------------------------------------------------------------


def copy_edge_denoise(model_t, H, n_full, n_focal):
    p = {
        "feature_embedding": copy_linear(model_t.feature_embedding),
        "vocab_embedding": {"embedding": jnp.asarray(t2n(model_t.vocab_embedding.weight))},
        "edge_embedding": copy_linear(model_t.edge_embedding),
        "node_embedding": copy_linear(model_t.node_embedding),
        "focal_head": copy_sequential_head(model_t.focal_predict),
        "edge_head": copy_sequential_head(model_t.edge_predict),
        "node_head": copy_sequential_head(model_t.node_predict),
        "gcl_edge": copy_fine_egcl(model_t._modules["gcl_edge"], H, 1),
        "gcl_denoise": copy_fine_egcl(model_t._modules["gcl_denoise"], H, 1),
    }
    for i in range(n_full):
        p[f"gcl_full_{i}"] = copy_fine_egcl(model_t._modules[f"gcl_full_{i}"], H, H)
    for i in range(n_focal):
        p[f"gcl_focal_{i}"] = copy_fine_egcl(model_t._modules[f"gcl_focal_{i}"], H, H)
    return p


def test_edge_denoise_full_forward_parity(ref):
    """All four heads + losses on identical weights and a real collated
    batch (reference's own PadCollate_onehot builds the edge programs)."""
    import random

    from hierdiff_tpu.data.denoise import collate_denoise, make_denoise_example
    from hierdiff_tpu.data.orders import dfs_bidirection, make_search_adjacencies
    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
    from hierdiff_tpu.models.edge_denoise import EdgeDenoise

    torch.manual_seed(7)
    H, B, N = 32, 3, 7
    gen = SyntheticTreeGenerator(seed=5)
    trees = gen.sample_trees(B, n=N)
    samp = [4, 5, 3]  # mid/late DFS steps: focal+edge+node heads all active

    # ---- reference batch through its own collate --------------------------
    ref_samples = []
    for t, k in zip(trees, samp):
        und, s_ind, l_ind = dfs_bidirection(t.adj, sampling=k)
        org, pad = make_search_adjacencies(t.adj, und, s_ind, l_ind)
        undisc_list = list(und) + ([s_ind] if s_ind not in und else [])
        token = t.wids.astype(np.float64).copy()
        token[undisc_list] = 780
        feat = np.concatenate([t.feats.astype(np.float64), token[:, None]], axis=1)
        discover = set(np.nonzero(org.sum(1) > 0)[0].tolist())
        val_miss = set(np.nonzero((t.adj - org).sum(1) != 0)[0].tolist())
        ref_samples.append({
            "feat": torch.tensor(feat, dtype=torch.float32),
            "position": torch.tensor(t.pos, dtype=torch.float32),
            "adj_matrix": np.asarray(t.adj),
            "search_adj_matrix_org": org,
            "search_adj_matrix": pad,
            "label": int(t.wids[s_ind]),
            "array": [],
            "focal": sorted(val_miss & discover),
            "discover": sorted(discover),
            "undiscovered": undisc_list,
            "predict_idx": s_ind,
            "last_ind": l_ind,
        })
    args = types.SimpleNamespace(int_feature_size=5, num_continutes_feature=3,
                                 context_nf=0)
    ref_batch = ref.collate.PadCollate_onehot(ref_samples, args)
    # bool -> float (newer torch refuses bool/float cat inside the forward)
    ref_batch["search_adj_matrix"] = ref_batch["search_adj_matrix"].float()
    ref_batch["edge_mask"] = ref_batch["edge_mask"].float()
    ref_batch["node_feat"][1] = ref_batch["node_feat"][1].float()

    model_t = ref.edge_denoise.Edge_denoise(
        vocab_size=781, in_node_nf=8, hidden_nf=H, out_node_nf=780,
        array_dict=None, n_layers_full=2, n_layers_focal=2,
        focal_loss=5, edge_loss=1, node_loss=2, full_softmax=True)
    model_t.eval()
    caps = {}
    model_t.focal_predict.register_forward_hook(
        lambda m, i, o: caps.__setitem__("focal_pred", o.detach()))
    with torch.no_grad():
        out_ref = model_t(ref_batch)

    # ---- our dense batch + model with copied weights -----------------------
    max_depth = len(ref_batch["edge_search_pad"])
    exs = [make_denoise_example(t, random.Random(0), sampling=k)
           for t, k in zip(trees, samp)]
    batch = {k: jnp.asarray(v) for k, v in collate_denoise(exs, max_n=N).items()}

    ours = EdgeDenoise(vocab_size=781, out_node_nf=780, in_node_nf=8, hidden_nf=H,
                       n_layers_full=2, n_layers_focal=2,
                       focal_weight=5.0, edge_weight=1.0, node_weight=2.0,
                       gated=False,             # reference updates every node
                       max_depth=max_depth, max_depth_node=max_depth + 1)
    params = {"params": copy_edge_denoise(model_t, H, 2, 2)}
    with jax.default_matmul_precision("highest"):
        out = ours.apply(params, batch)

    # our losses are batch means; the reference returns per-batch sums
    for key in ("edge_loss", "node_loss"):
        np.testing.assert_allclose(float(out[key]) * B, float(out_ref[key]),
                                   rtol=2e-3, atol=2e-3, err_msg=key)
    for key in ("focal_accuracy", "edge_accuracy", "node_accuracy"):
        np.testing.assert_allclose(float(out[key]), float(out_ref[key]),
                                   atol=1e-6, err_msg=key)

    # FOCAL LOSS — reference bug, pinned both ways (see models/edge_denoise.py
    # module doc): split_edges receives the [rows, cols] flat format but
    # iterates edge pairs (edge_denoise.py:124-126 vs :500-505), so only the
    # sample owning the first flat edge contributes its BCE. Recompute both
    # interpretations from the reference's own focal_predict output:
    scores = t2n(caps["focal_pred"]).squeeze(-1)
    labels = t2n(ref_batch["focal"]).astype(np.float64)
    cand_owner = np.array([c // N for c in ref_batch["focal_cand"]])
    bce = -(labels * np.log(scores) + (1 - labels) * np.log(1 - scores))
    per_sample = np.array([bce[cand_owner == i].mean() for i in range(B)])
    # (a) the reference value IS the sample-0-only sum (evidencing the bug)
    np.testing.assert_allclose(float(out_ref["focal_loss"]), per_sample[0],
                               rtol=1e-5)
    # (b) ours is the all-samples sum (the evident intent), same head output
    np.testing.assert_allclose(float(out["focal_loss"]) * B, per_sample.sum(),
                               rtol=2e-3)
    # total: identical up to the focal-gate correction
    corrected_total = (5 * per_sample.sum() + float(out_ref["edge_loss"])
                       + 2 * float(out_ref["node_loss"]))
    np.testing.assert_allclose(float(out["total_loss"]) * B, corrected_total,
                               rtol=2e-3)


# --------------------------------------------------------------------------
# 4. Node2Vec (refine model) full forward
# --------------------------------------------------------------------------


def test_node2vec_forward_parity(ref, tmp_path):
    import pickle

    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
    from hierdiff_tpu.models.refine import NodeRefine

    torch.manual_seed(11)
    H, B, N, V = 32, 3, 7, 780
    # synthetic heavy-atom sizes: size(wid) = wid % 20 + 1
    sizes_of_wid = np.arange(V) % 20 + 1
    size_dict = {s: [w for w in range(V) if sizes_of_wid[w] == s]
                 for s in range(1, 21)}
    sd_path = tmp_path / "size_dict.pkl"
    sd_path.write_bytes(pickle.dumps(size_dict))

    gen = SyntheticTreeGenerator(seed=9)
    trees = gen.sample_trees(B, n=N)
    masked = [2, 4, 0]

    # ---- reference batch (mirrors dataset_refine.PadCollate) ---------------
    feature = torch.zeros(B, N, 8)
    vocab_t = torch.zeros(B, N, dtype=torch.long)
    size_t = torch.zeros(B, N, dtype=torch.long)
    label_t = torch.zeros(B, dtype=torch.long)
    pos_t = torch.zeros(B, N, 3)
    mask_t = torch.zeros(B, N, 1)
    val_t = torch.zeros(B)
    per_sample_edges = []
    for i, (t, m) in enumerate(zip(trees, masked)):
        feats = t.feats.astype(np.float32).copy()
        feats[m] = 0.0
        wids = t.wids.astype(np.int64).copy()
        label_t[i] = int(wids[m])
        wids[m] = 780
        feature[i] = torch.tensor(feats)
        vocab_t[i] = torch.tensor(wids)
        size_t[i] = torch.tensor(sizes_of_wid[np.where(t.wids >= 0, t.wids, 0)])
        pos_t[i] = torch.tensor(t.pos.astype(np.float32))
        mask_t[i] = 1.0
        val_t[i] = float(t.adj[m].sum())
        e = np.nonzero(t.adj)
        layers = ref.model_refine.get_bfs_depth_edges(
            [list(e[0]), list(e[1])], m, N)
        per_sample_edges.append(layers)
    max_depth = max(len(e) for e in per_sample_edges)
    edges_pad = [[[], []] for _ in range(max_depth)]
    for i, layers in enumerate(per_sample_edges):
        for j, (rows, cols) in enumerate(layers):
            edges_pad[j][0].extend([r + i * N for r in rows])
            edges_pad[j][1].extend([c + i * N for c in cols])
    ref_batch = {"feature": feature, "pos": pos_t, "vocab": vocab_t,
                 "label": label_t, "size": size_t, "mask": mask_t,
                 "edges": edges_pad, "predict_idx": masked, "val": val_t}

    model_t = ref.model_refine.Node2Vec(
        size_dict=str(sd_path), vocab_size=V, feature_size=8,
        hidden_size=H, n_layers=2)
    model_t.eval()
    with torch.no_grad():
        out_ref = model_t(ref_batch)

    # ---- ours ---------------------------------------------------------------
    batch = {
        "feats": jnp.asarray(t2n(feature)),
        "vocab": jnp.asarray(t2n(vocab_t)).astype(jnp.int32),
        "size": jnp.asarray(t2n(size_t)).astype(jnp.int32),
        "pos": jnp.asarray(t2n(pos_t)),
        "adj": jnp.asarray(np.stack([t.adj.astype(np.float32) for t in trees])),
        "node_mask": jnp.asarray(t2n(mask_t)),
        "predict_idx": jnp.asarray(np.array(masked, np.int32)),
        "label": jnp.asarray(t2n(label_t)).astype(jnp.int32),
        "val": jnp.asarray(t2n(val_t)),
        "size_support": jnp.asarray(np.stack([
            np.isin(np.arange(V), size_dict[int(sizes_of_wid[l])]).astype(np.float32)
            for l in t2n(label_t)])),
    }
    ours = NodeRefine(vocab_size=V, feature_size=8, hidden_size=H, n_layers=2,
                      gated=False, max_depth=max_depth)
    params = {"params": {
        "v_embedding": {"embedding": jnp.asarray(t2n(model_t.v_embedding.weight))},
        "size_embedding": {"embedding": jnp.asarray(t2n(model_t.size_embedding.weight))},
        "f_embedding": copy_sequential_head(model_t.f_embedding),
        "projection": copy_sequential_head(model_t.projection, (0, 2, 4)),
        "output": copy_sequential_head(model_t.output),
        **{f"gcl_{ph}{i}": copy_fine_egcl(model_t._modules[f"gcl_{ph}{i}"], H, 1)
           for ph in ("collect", "reverse", "back") for i in range(2)},
    }}
    with jax.default_matmul_precision("highest"):
        out = ours.apply(params, batch)
    np.testing.assert_allclose(float(out["loss"]) * B, float(out_ref["loss"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(out["accuracy"]), float(out_ref["accuracy"]),
                               atol=1e-6)


# --------------------------------------------------------------------------
# 5. DiffusionQM9 gamma/loss algebra (learned schedule, both estimators)
# --------------------------------------------------------------------------


def _copy_gamma(gamma_t):
    def pl(lin):
        return {"kernel": jnp.asarray(t2n(lin.weight).T),
                "bias": jnp.asarray(t2n(lin.bias))}
    return {"l1": pl(gamma_t.l1), "l2": pl(gamma_t.l2), "l3": pl(gamma_t.l3),
            "gamma_0": jnp.asarray(t2n(gamma_t.gamma_0)),
            "gamma_1": jnp.asarray(t2n(gamma_t.gamma_1))}


@pytest.fixture(scope="module")
def diffusion_pair(ref, tmp_path_factory):
    """Reference DiffusionQM9 + our CoarseDiffusion on identical weights."""
    import yaml as pyyaml

    from hierdiff_tpu.models.diffusion import CoarseDiffusion

    H, T = 32, 50
    hist = tmp_path_factory.mktemp("dq9") / "hist.yaml"
    hist.write_text(pyyaml.dump({5: 10, 6: 20}))
    dyn = AttrDict(in_node_nf=0, context_node_nf=0, n_dims=3, hidden_nf=H,
                   n_layers=2, attention=True, condition_time=True, tanh=True,
                   mode="egnn_dynamics", norm_constant=0, inv_sublayers=2,
                   sin_embedding=False, normalization_factor=10,
                   aggregation_method="sum", act_fn="silu")
    cfg = AttrDict(pocket=False, node_coarse_type="prop", dynamics=dyn,
                   loss_type="vlb", include_charges=0, noise_schedule="learned",
                   parametrization="eps", dataset="geom", hcontinous=False,
                   timesteps=T, norm_values=[1.0, 1.0, 1.0],
                   norm_biases=[0.0, 0.0, 0.0], data_augmentation=False,
                   analyze=str(hist))
    torch.manual_seed(13)
    model_t = ref.diffusion.DiffusionQM9(cfg)
    model_t.eval()

    ours = CoarseDiffusion(in_node_nf=8, timesteps=T, hidden_nf=H, n_layers=2,
                           inv_sublayers=2, noise_schedule="learned",
                           normalization_factor=10.0, norm_constant=0.0)
    params = {"params": {"gamma": _copy_gamma(model_t.gamma),
                         "dynamics": {"egnn": copy_full_egnn(model_t.dynamics.egnn, H, 2, 2)}}}
    return model_t, ours, params, T


def _diffusion_inputs(T, B=2, N=6, seed=21):
    from hierdiff_tpu.ops.masked import remove_mean_with_mask, sample_combined_noise

    rng = np.random.default_rng(seed)
    counts = [5, 6]
    node_mask = np.zeros((B, N, 1), np.float32)
    edge_mask = np.zeros((B, N, N), np.float32)
    for i, c in enumerate(counts):
        node_mask[i, :c] = 1
        edge_mask[i, :c, :c] = 1 - np.eye(c)
    x = rng.standard_normal((B, N, 3)).astype(np.float32) * node_mask
    x = np.asarray(remove_mean_with_mask(jnp.asarray(x), jnp.asarray(node_mask)))
    h = rng.standard_normal((B, N, 8)).astype(np.float32) * node_mask
    eps = np.asarray(sample_combined_noise(jax.random.PRNGKey(seed),
                                           jnp.asarray(node_mask), 3, 8))
    eps0 = np.asarray(sample_combined_noise(jax.random.PRNGKey(seed + 1),
                                            jnp.asarray(node_mask), 3, 8))
    return x, h, node_mask, edge_mask, eps, eps0


def _stray_colon_delta(model_t, xh, eps_used, gamma, net_out):
    """buggy-minus-corrected continuous-h term of the t=0 likelihood
    (reference diffusion_qm9.py:477 slices net_out[:, :, :8:11] — start 0,
    stop 8, STEP 11 — i.e. channel 0 only; we implement the evident intent)."""
    nd, inf, cnf = 3, 5, 3
    eps_h = eps_used[:, :, nd + inf: nd + inf + cnf]
    net_bug = net_out[:, :, :nd + inf: nd + inf + cnf]
    net_fix = net_out[:, :, nd + inf: nd + inf + cnf]
    bug = -0.5 * ((eps_h - net_bug) ** 2).flatten(1).sum(1)
    fix = -0.5 * ((eps_h - net_fix) ** 2).flatten(1).sum(1)
    return bug - fix   # my_loss - ref_loss (loss_term_0 = -log_p)


def test_diffusion_loss_parity_t0_always(ref, diffusion_pair):
    """Eval estimator (t0_always=True): both forward passes + full VLB."""
    from unittest import mock

    from hierdiff_tpu.models.diffusion import CoarseDiffusion

    model_t, ours, params, T = diffusion_pair
    B = 2
    x, h, nm, em, eps, eps0 = _diffusion_inputs(T)
    t_int = np.array([[3], [T]], np.int64)

    noises = iter([torch.tensor(eps), torch.tensor(eps0)])
    model_t.sample_combined_position_feature_noise = \
        lambda n_samples, n_nodes, node_mask: next(noises)
    with mock.patch("torch.randint", return_value=torch.tensor(t_int)), torch.no_grad():
        loss_ref, _ = model_t.compute_loss(
            torch.tensor(x), torch.tensor(h), torch.tensor(nm).bool(),
            torch.tensor(em), None, t0_always=True)

    with jax.default_matmul_precision("highest"):
        loss_my, info = ours.apply(
            params, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h),
            jnp.asarray(nm), jnp.asarray(em), None, True, False,
            t_int=jnp.asarray(t_int), eps=jnp.asarray(eps), eps0=jnp.asarray(eps0),
            method=CoarseDiffusion.compute_loss)

    # account for the stray-colon bug in the reference's t=0 term
    with torch.no_grad(), jax.default_matmul_precision("highest"):
        xh_t = torch.cat([torch.tensor(x), torch.tensor(h)], dim=2)
        zeros = torch.zeros((B, 1))
        gamma_0 = model_t.inflate_batch_array(model_t.gamma(zeros), xh_t)
        z_0 = (model_t.alpha(gamma_0, xh_t) * xh_t
               + model_t.sigma(gamma_0, xh_t) * torch.tensor(eps0))
        net0 = model_t.phi(z_0, zeros, torch.tensor(nm).bool(), torch.tensor(em), None)
        delta = _stray_colon_delta(model_t, xh_t, torch.tensor(eps0), gamma_0, net0)
    # rtol 5e-3: the VLB total is T-amplified (x50) over two full EGNN
    # passes; per-tensor network parity is pinned at 5e-4 above
    np.testing.assert_allclose(np.asarray(loss_my),
                               t2n(loss_ref) + t2n(delta), rtol=5e-3)


def test_diffusion_loss_parity_sampled_t(ref, diffusion_pair):
    """Training estimator (t0_always=False) incl. an in-batch t=0 row."""
    from unittest import mock

    from hierdiff_tpu.models.diffusion import CoarseDiffusion

    model_t, ours, params, T = diffusion_pair
    B = 2
    x, h, nm, em, eps, _ = _diffusion_inputs(T, seed=33)
    t_int = np.array([[0], [17]], np.int64)   # row 0 exercises the t=0 branch

    model_t.sample_combined_position_feature_noise = \
        lambda n_samples, n_nodes, node_mask: torch.tensor(eps)
    with mock.patch("torch.randint", return_value=torch.tensor(t_int)), torch.no_grad():
        loss_ref, _ = model_t.compute_loss(
            torch.tensor(x), torch.tensor(h), torch.tensor(nm).bool(),
            torch.tensor(em), None, t0_always=False)

    with jax.default_matmul_precision("highest"):
        loss_my, info = ours.apply(
            params, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h),
            jnp.asarray(nm), jnp.asarray(em), None, False, False,
            t_int=jnp.asarray(t_int), eps=jnp.asarray(eps),
            method=CoarseDiffusion.compute_loss)

    # stray-colon correction applies to rows with t == 0 (masked branch),
    # scaled by the (T+1) estimator factor
    with torch.no_grad():
        xh_t = torch.cat([torch.tensor(x), torch.tensor(h)], dim=2)
        t = torch.tensor(t_int).float() / T
        gamma_t = model_t.inflate_batch_array(model_t.gamma(t), xh_t)
        z_t = (model_t.alpha(gamma_t, xh_t) * xh_t
               + model_t.sigma(gamma_t, xh_t) * torch.tensor(eps))
        net = model_t.phi(z_t, t, torch.tensor(nm).bool(), torch.tensor(em), None)
        delta = _stray_colon_delta(model_t, xh_t, torch.tensor(eps), gamma_t, net)
        t_is_zero = (torch.tensor(t_int) == 0).float().squeeze(1)
        delta = delta * t_is_zero * (T + 1)
    np.testing.assert_allclose(np.asarray(loss_my),
                               t2n(loss_ref) + t2n(delta), rtol=5e-3)


def test_reverse_kernel_parity(ref, diffusion_pair):
    """Sampling kernels vs the reference on identical weights: the mu/sigma
    of p(z_s | z_t) (diffusion_qm9.py:312-337 sample_p_zs_given_zt) and of
    p(x | z_0) (:294-310 sample_p_xh_given_z0) — the two device kernels the
    lax.scan sampler iterates."""
    from hierdiff_tpu.models.diffusion import CoarseDiffusion
    from hierdiff_tpu.ops.masked import remove_mean_with_mask

    model_t, ours, params, T = diffusion_pair
    x, h, node_mask, edge_mask, eps, _ = _diffusion_inputs(T)
    B, N = x.shape[:2]
    zt = np.concatenate([x, h], axis=2).astype(np.float32)  # stand-in latent
    t_int, s_int = 30, 29
    t = np.full((B, 1), t_int / T, np.float32)
    s = np.full((B, 1), s_int / T, np.float32)

    # --- torch mu/sigma of p(z_s | z_t), mirroring sample_p_zs_given_zt ---
    zt_t = torch.tensor(zt)
    nm_t = torch.tensor(node_mask).bool()   # reference asserts use ~node_mask
    em_flat = torch.tensor(edge_mask.reshape(B * N * N, 1))
    with torch.no_grad():
        gamma_s = model_t.gamma(torch.tensor(s))
        gamma_t = model_t.gamma(torch.tensor(t))
        s2_ts, s_ts, a_ts = model_t.sigma_and_alpha_t_given_s(gamma_t, gamma_s, zt_t)
        sigma_s = model_t.sigma(gamma_s, target_tensor=zt_t)
        sigma_t = model_t.sigma(gamma_t, target_tensor=zt_t)
        eps_t = model_t.phi(zt_t, torch.tensor(t), nm_t, em_flat, None)
        eps_t[:, :, :3] = torch.tensor(np.asarray(remove_mean_with_mask(
            jnp.asarray(t2n(eps_t[:, :, :3])), jnp.asarray(node_mask))))
        mu_ref = zt_t / a_ts - (s2_ts / a_ts / sigma_t) * eps_t
        sigma_ref = s_ts * sigma_s / sigma_t

    with jax.default_matmul_precision("highest"):
        gamma_s_j = ours.apply(params, jnp.asarray(s), method=CoarseDiffusion.gamma_of)
        gamma_t_j = ours.apply(params, jnp.asarray(t), method=CoarseDiffusion.gamma_of)
        mu_j, sigma_j = ours.apply(params, jnp.asarray(zt), gamma_s_j, gamma_t_j,
                                   jnp.asarray(node_mask), jnp.asarray(edge_mask),
                                   jnp.asarray(t), method=CoarseDiffusion.sample_zs_stats)
    # tolerance matches the dynamics forward parity (5e-4): mu inherits the
    # EGNN output drift scaled by sigma2_ts/(alpha_ts*sigma_t)
    np.testing.assert_allclose(np.asarray(mu_j), t2n(mu_ref), atol=1e-3,
                               err_msg="mu of p(z_s|z_t)")
    # rtol bounded by the gamma network's own ~4e-4 intra-call noise (see
    # test_gamma_network_parity)
    np.testing.assert_allclose(np.asarray(sigma_j).reshape(-1),
                               t2n(sigma_ref).reshape(-1), rtol=2e-3,
                               err_msg="sigma of p(z_s|z_t)")

    # --- torch mu/sigma of p(x | z_0) ---
    with torch.no_grad():
        zeros = torch.zeros((B, 1))
        gamma_0 = model_t.gamma(zeros)
        sigma_x_ref = model_t.SNR(-0.5 * gamma_0).unsqueeze(1)
        net0 = model_t.phi(zt_t, zeros, nm_t, em_flat, None)
        mu_x_ref = model_t.compute_x_pred(net0, zt_t, gamma_0)

    with jax.default_matmul_precision("highest"):
        mu_x_j, sigma_x_j = ours.apply(params, jnp.asarray(zt), jnp.asarray(node_mask),
                                       jnp.asarray(edge_mask),
                                       method=CoarseDiffusion.sample_x_given_z0_stats)
    np.testing.assert_allclose(np.asarray(mu_x_j), t2n(mu_x_ref), atol=1e-3,
                               err_msg="mu of p(x|z_0)")
    np.testing.assert_allclose(np.asarray(sigma_x_j).reshape(-1),
                               t2n(sigma_x_ref).reshape(-1), rtol=2e-3,
                               err_msg="sigma of p(x|z_0)")


def test_gamma_network_parity(ref, diffusion_pair):
    """GammaNetwork values on copied weights (isolates the sigma drift)."""
    from hierdiff_tpu.models.diffusion import CoarseDiffusion

    model_t, ours, params, T = diffusion_pair
    # the torch gamma itself returns row-to-row deltas up to ~4e-4 for
    # IDENTICAL inputs in one call (threaded GEMM reduction over the
    # 1024-wide l3, amplified by the [gamma_tilde_0, gamma_tilde_1]
    # normalization's conditioning on untrained weights) — 1e-3 is the
    # tightest meaningful bar
    for tv in [0.0, 0.25, 0.58, 0.6, 1.0]:
        s = np.full((2, 1), tv, np.float32)
        with torch.no_grad():
            g_ref = t2n(model_t.gamma(torch.tensor(s)))
        g_j = np.asarray(ours.apply(params, jnp.asarray(s),
                                    method=CoarseDiffusion.gamma_of))
        np.testing.assert_allclose(g_j, g_ref, atol=1e-3, err_msg=f"t={tv}")
