"""Import trained reference (torch) checkpoints into this framework.

The reference ships PyTorch-Lightning checkpoints for all three stages
(coarse `DiffusionQM9`, fine `Edge_denoise`, refine `Node2Vec`); users
migrating from it should be able to keep their trained weights. This module
converts a torch ``state_dict`` into the exact flax parameter trees our
models consume — the same mapping the golden-parity suite proves correct
end-to-end (tests/test_reference_parity_full.py: full-model forward/loss
parity on copied weights).

Key facts about the reference checkpoints this mirrors:

- consumers strip an optional ``model.`` key prefix
  (/root/reference/endiffusion/sampler.py:28-34,
  /root/reference/generation/ar_sampling_nosize.py:333-342);
- the coarse EGNN layer layout is ``dynamics.egnn.e_block_{i}.gcl_{j}`` +
  ``gcl_equiv`` (/root/reference/endiffusion/models/layers/egnn_new.py:129-183),
  with pair-MLP first linears we decompose into w_src/w_dst/w_e
  (ops/egnn.py docstring);
- the learned schedule is ``gamma.{l1,l2,l3,gamma_0,gamma_1}``
  (/root/reference/endiffusion/models/noise_model.py:163-173); predefined
  schedules persist only a ``gamma.gamma`` table buffer (no parameters);
- the fine-stage E_GCL is ``{mes,node,coord,att,edge}_mlp``
  (/root/reference/models/egnn/gcl.py:30-66), Edge_denoise submodules at
  /root/reference/models/edge_denoise.py:28-56, Node2Vec at
  /root/reference/models/model_refine.py:24-43.

Model hyperparameters (layer counts, hidden width, attention) are INFERRED
from the state dict; only semantics the weights cannot express (timesteps,
noise-schedule family for predefined tables, norm values) must be supplied.

All conversion is pure numpy; torch is needed only by
``load_torch_checkpoint`` to deserialize the file.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Set, Tuple

import numpy as np

Params = Dict[str, object]
StateDict = Dict[str, np.ndarray]


class ImportError_(ValueError):
    """A state-dict key expected by the mapping is missing or malformed."""


def load_torch_checkpoint(path: str) -> StateDict:
    """torch/PL checkpoint file -> {key: np.ndarray} with 'model.' stripped.

    Accepts either a raw state_dict or the PL wrapper ``{'state_dict': ...}``
    and replicates the reference's key-prefix strip (sampler.py:28-34).
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # real reference PL checkpoints embed the hydra/easydict config via
        # save_hyperparameters() (trainmodule/Edge_denoise.py:21,
        # diffusion_qm9.py:41), which the weights-only unpickler rejects;
        # fall back to a full load — the user is importing their own
        # training artifact
        obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k.replace("model.", "", 1) if k.startswith("model.") else k] = \
            np.asarray(v)
    return out


class _Tracker:
    """Wraps a state dict, recording consumed keys for leftover reporting."""

    def __init__(self, sd: StateDict):
        self.sd = sd
        self.used: Set[str] = set()

    def __contains__(self, key: str) -> bool:
        return key in self.sd

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise ImportError_(f"state dict is missing expected key {key!r}")
        self.used.add(key)
        return self.sd[key]

    def leftovers(self, ignore: Tuple[str, ...] = ()) -> Set[str]:
        rest = set(self.sd) - self.used
        return {k for k in rest if not any(re.fullmatch(p, k) for p in ignore)}


def _linear(tr: _Tracker, prefix: str, bias: bool = True) -> Params:
    p = {"kernel": tr.take(f"{prefix}.weight").T}
    if bias:
        p["bias"] = tr.take(f"{prefix}.bias")
    return p


def _embedding(tr: _Tracker, prefix: str) -> Params:
    return {"embedding": tr.take(f"{prefix}.weight")}


def _sequential(tr: _Tracker, prefix: str, dense_indices=(0, 2)) -> Params:
    """torch Sequential(Linear, act, ...) -> flax nn.Sequential layers_{i}."""
    return {f"layers_{i}": _linear(tr, f"{prefix}.{i}") for i in dense_indices}


def _count(sd: StateDict, pattern: str) -> int:
    """Number of distinct {i} substitutions with any key present."""
    rx = re.compile("^" + re.escape(pattern).replace(r"\{i\}", r"(\d+)") + r"\.")
    found = {int(m.group(1)) for k in sd if (m := rx.match(k))}
    if found and found != set(range(max(found) + 1)):
        raise ImportError_(f"non-contiguous indices for {pattern}: {sorted(found)}")
    return len(found)


# --------------------------------------------------------------------------
# coarse stage (DiffusionQM9 -> CoarseDiffusion)
# --------------------------------------------------------------------------


def _coarse_gcl(tr: _Tracker, prefix: str) -> Params:
    """endiffusion GCL -> ops.egnn.DenseGCL raw params (decomposed pair
    linear, matching tests/test_reference_parity_full.copy_coarse_gcl)."""
    w0 = tr.take(f"{prefix}.edge_mlp.0.weight")   # (hnf, 2H + e)
    hnf = w0.shape[0]
    p = {
        "edge_in_w_src": w0[:, :hnf].T,
        "edge_in_w_dst": w0[:, hnf:2 * hnf].T,
        "edge_in_w_e": w0[:, 2 * hnf:].T,
        "edge_in_bias": tr.take(f"{prefix}.edge_mlp.0.bias"),
        "edge_out_kernel": tr.take(f"{prefix}.edge_mlp.2.weight").T,
        "edge_out_bias": tr.take(f"{prefix}.edge_mlp.2.bias"),
        "node_in_kernel": tr.take(f"{prefix}.node_mlp.0.weight").T,
        "node_in_bias": tr.take(f"{prefix}.node_mlp.0.bias"),
        "node_out_kernel": tr.take(f"{prefix}.node_mlp.2.weight").T,
        "node_out_bias": tr.take(f"{prefix}.node_mlp.2.bias"),
    }
    if f"{prefix}.att_mlp.0.weight" in tr:
        p["att_kernel"] = tr.take(f"{prefix}.att_mlp.0.weight").T
        p["att_bias"] = tr.take(f"{prefix}.att_mlp.0.bias")
    return p


def _coarse_equiv(tr: _Tracker, prefix: str) -> Params:
    w0 = tr.take(f"{prefix}.coord_mlp.0.weight")
    hnf = tr.take(f"{prefix}.coord_mlp.2.weight").shape[0]
    return {
        "coord_in_w_src": w0[:, :hnf].T,
        "coord_in_w_dst": w0[:, hnf:2 * hnf].T,
        "coord_in_w_e": w0[:, 2 * hnf:].T,
        "coord_in_bias": tr.take(f"{prefix}.coord_mlp.0.bias"),
        "coord_mid_kernel": tr.take(f"{prefix}.coord_mlp.2.weight").T,
        "coord_mid_bias": tr.take(f"{prefix}.coord_mlp.2.bias"),
        "coord_head_kernel": tr.take(f"{prefix}.coord_mlp.4.weight").T,
    }


def _coarse_egnn(tr: _Tracker, prefix: str) -> Tuple[Params, Dict[str, int]]:
    n_layers = _count(tr.sd, f"{prefix}.e_block_{{i}}")
    if n_layers == 0:
        raise ImportError_(f"no {prefix}.e_block_* keys — not a coarse EGNN")
    inv = _count(tr.sd, f"{prefix}.e_block_0.gcl_{{i}}")
    p: Params = {"embedding": _linear(tr, f"{prefix}.embedding"),
                 "embedding_out": _linear(tr, f"{prefix}.embedding_out")}
    for i in range(n_layers):
        bp = {f"gcl_{j}": _coarse_gcl(tr, f"{prefix}.e_block_{i}.gcl_{j}")
              for j in range(inv)}
        bp["gcl_equiv"] = _coarse_equiv(tr, f"{prefix}.e_block_{i}.gcl_equiv")
        p[f"e_block_{i}"] = bp
    hidden = int(p["embedding"]["kernel"].shape[1])
    has_att = "att_kernel" in p["e_block_0"]["gcl_0"]
    inferred = {"n_layers": n_layers, "inv_sublayers": inv,
                "hidden_nf": hidden, "attention": has_att}
    # edge-feature width identifies sin_embedding (egnn_new.py:173-179):
    # 2 = [radial, distances0]; 24 = two 12-dim sinusoid embeddings
    e_dim = int(p["e_block_0"]["gcl_0"]["edge_in_w_e"].shape[0])
    if e_dim == 24:
        inferred["sin_embedding"] = True
    elif e_dim != 2:
        raise ImportError_(
            f"unrecognized edge-feature width {e_dim} in {prefix}.e_block_0 "
            "(expected 2, or 24 for sin_embedding=True checkpoints)")
    return p, inferred


def _coarse_gnn(tr: _Tracker, prefix: str) -> Tuple[Params, Dict[str, int]]:
    """Plain-GNN dynamics backbone (mode='gnn_dynamics',
    egnn_new.py:208-242): embedding -> gcl_{i} -> embedding_out."""
    n_layers = _count(tr.sd, f"{prefix}.gcl_{{i}}")
    if n_layers == 0:
        raise ImportError_(f"no {prefix}.gcl_* keys — not a GNN backbone")
    p: Params = {"embedding": _linear(tr, f"{prefix}.embedding"),
                 "embedding_out": _linear(tr, f"{prefix}.embedding_out")}
    for i in range(n_layers):
        p[f"gcl_{i}"] = _coarse_gcl(tr, f"{prefix}.gcl_{i}")
    hidden = int(p["embedding"]["kernel"].shape[1])
    has_att = "att_kernel" in p["gcl_0"]
    return p, {"n_layers": n_layers, "hidden_nf": hidden,
               "attention": has_att, "mode": "gnn_dynamics"}


def _gamma_network(tr: _Tracker) -> Params:
    return {"l1": _linear(tr, "gamma.l1"), "l2": _linear(tr, "gamma.l2"),
            "l3": _linear(tr, "gamma.l3"),
            "gamma_0": tr.take("gamma.gamma_0"),
            "gamma_1": tr.take("gamma.gamma_1")}


def convert_coarse(sd: StateDict) -> Tuple[Params, Dict[str, object], Set[str]]:
    """DiffusionQM9 state dict -> (CoarseDiffusion params, inferred cfg,
    leftover keys). Inferred: n_layers / inv_sublayers / hidden_nf /
    attention / noise_schedule ('learned' when gamma-net params exist) /
    in_plus_context (embedding input minus the time channel)."""
    tr = _Tracker(sd)
    if any(k.startswith("dynamics.gnn.") for k in sd):
        # mode='gnn_dynamics' (en_dynamics.py:25-30): plain GNN over [x, h]
        gnn, inferred = _coarse_gnn(tr, "dynamics.gnn")
        params: Params = {"dynamics": {"gnn": gnn}}
        if "gamma.l1.weight" in sd:
            params["gamma"] = _gamma_network(tr)
            inferred["noise_schedule"] = "learned"
        if "pocket_embed.weight" in sd:
            params["pocket_embed"] = _embedding(tr, "pocket_embed")
            inferred["pocket"] = True
        # GNN input = [x(3), h, time] (en_dynamics.py:27,90)
        in_cols = int(gnn["embedding"]["kernel"].shape[0])
        inferred["in_plus_context"] = in_cols - 3 - 1
        # Deliberate divergence (PARITY.md): this port sizes the GNN output
        # to the FULL input width (vel + every h channel incl. context),
        # while the reference uses out_node_nf = 3 + in_node_nf with context
        # EXCLUDED (en_dynamics.py:27) — and then mis-slices it, so context
        # gnn checkpoints are unusable in the reference too. Refuse clearly
        # instead of failing on a shape mismatch deep in the copier.
        out_cols = int(gnn["embedding_out"]["kernel"].shape[1])
        if out_cols != in_cols:
            raise ImportError_(
                f"gnn_dynamics embedding_out width {out_cols} != input "
                f"width {in_cols}: the checkpoint was built with "
                "context_node_nf > 0, where the reference GNN's output "
                "excludes context columns (en_dynamics.py:27); this port "
                "deliberately diverges (see PARITY.md) and cannot load it")
        return params, inferred, tr.leftovers(ignore=(r"gamma\.gamma", r"buffer"))
    egnn, inferred = _coarse_egnn(tr, "dynamics.egnn")
    params: Params = {"dynamics": {"egnn": egnn}}
    if "gamma.l1.weight" in sd:
        params["gamma"] = _gamma_network(tr)
        inferred["noise_schedule"] = "learned"
    # NOTE: predefined schedules persist only the gamma table buffer, which
    # does not identify the family (cosine vs polynomial/power/precision) —
    # inferred carries no noise_schedule then and the import CLI requires an
    # explicit --set coarse.noise_schedule=... override.
    if "pocket_embed.weight" in sd:
        # crossdock pocket variant (diffusion_qm9.py:56)
        params["pocket_embed"] = _embedding(tr, "pocket_embed")
        inferred["pocket"] = True
    # time channel is always appended by the dynamics wrapper
    # (en_dynamics.py:49; condition_time=True in every live config)
    in_cols = int(egnn["embedding"]["kernel"].shape[0])
    inferred["in_plus_context"] = in_cols - 1
    # 'gamma.gamma' = predefined schedule table buffer; 'buffer' = the
    # dtype/device probe DiffusionQM9 registers (diffusion_qm9.py:106)
    # sin_embedding registers only a constant 'frequencies' buffer
    leftovers = tr.leftovers(ignore=(r"gamma\.gamma", r"buffer",
                                     r".*sin_embedding\.frequencies"))
    return params, inferred, leftovers


# --------------------------------------------------------------------------
# fine stage (Edge_denoise -> EdgeDenoise, Node2Vec -> NodeRefine)
# --------------------------------------------------------------------------


def _fine_egcl(tr: _Tracker, prefix: str) -> Params:
    """fine-stage E_GCL -> ops.gcl.DenseEGCL params (mirrors
    tests/test_reference_parity_full.copy_fine_egcl)."""
    w0 = tr.take(f"{prefix}.mes_mlp.0.weight")    # (H, 2H + 1 + e)
    hnf = w0.shape[0]
    p: Params = {
        "mes_src": {"kernel": w0[:, :hnf].T,
                    "bias": tr.take(f"{prefix}.mes_mlp.0.bias")},
        "mes_dst": {"kernel": w0[:, hnf:2 * hnf].T},
        "mes_rad": {"kernel": w0[:, 2 * hnf:2 * hnf + 1].T},
        "mes_out": _linear(tr, f"{prefix}.mes_mlp.2"),
        "node_in": _linear(tr, f"{prefix}.node_mlp.0"),
        "node_out": _linear(tr, f"{prefix}.node_mlp.2"),
        "coord_in": _linear(tr, f"{prefix}.coord_mlp.0"),
        "coord_head": {"kernel": tr.take(f"{prefix}.coord_mlp.2.weight").T},
    }
    if w0.shape[1] > 2 * hnf + 1:
        p["mes_e"] = {"kernel": w0[:, 2 * hnf + 1:].T}
    if f"{prefix}.att_mlp.0.weight" in tr:
        p["att"] = _linear(tr, f"{prefix}.att_mlp.0")
    if f"{prefix}.edge_mlp.0.weight" in tr:
        p["edge_in"] = _linear(tr, f"{prefix}.edge_mlp.0")
        p["edge_out"] = _linear(tr, f"{prefix}.edge_mlp.2")
    return p


def convert_denoise(sd: StateDict) -> Tuple[Params, Dict[str, object], Set[str]]:
    """Edge_denoise state dict -> (EdgeDenoise params, inferred cfg,
    leftovers). Inferred: hidden_nf / in_node_nf / vocab_size / out_node_nf /
    n_layers_full / n_layers_focal."""
    tr = _Tracker(sd)
    n_full = _count(sd, "gcl_full_{i}")
    n_focal = _count(sd, "gcl_focal_{i}")
    if n_full == 0:
        raise ImportError_("no gcl_full_* keys — not an Edge_denoise state dict")
    params: Params = {
        "feature_embedding": _linear(tr, "feature_embedding"),
        "vocab_embedding": _embedding(tr, "vocab_embedding"),
        "edge_embedding": _linear(tr, "edge_embedding"),
        "node_embedding": _linear(tr, "node_embedding"),
        "focal_head": _sequential(tr, "focal_predict"),
        "edge_head": _sequential(tr, "edge_predict"),
        "node_head": _sequential(tr, "node_predict"),
        "gcl_edge": _fine_egcl(tr, "gcl_edge"),
        "gcl_denoise": _fine_egcl(tr, "gcl_denoise"),
    }
    for i in range(n_full):
        params[f"gcl_full_{i}"] = _fine_egcl(tr, f"gcl_full_{i}")
    for i in range(n_focal):
        params[f"gcl_focal_{i}"] = _fine_egcl(tr, f"gcl_focal_{i}")
    fe = params["feature_embedding"]["kernel"]
    inferred = {
        "hidden_nf": int(fe.shape[1]),
        "in_node_nf": int(fe.shape[0]),
        "vocab_size": int(params["vocab_embedding"]["embedding"].shape[0]),
        "out_node_nf": int(params["node_head"]["layers_2"]["kernel"].shape[1]),
        "n_layers_full": n_full,
        "n_layers_focal": n_focal,
    }
    return params, inferred, tr.leftovers()


def convert_refine(sd: StateDict) -> Tuple[Params, Dict[str, object], Set[str]]:
    """Node2Vec state dict -> (NodeRefine params, inferred cfg, leftovers).
    Inferred: hidden_size / feature_size / vocab_size / n_layers."""
    tr = _Tracker(sd)
    n_layers = _count(sd, "gcl_collect{i}")
    if n_layers == 0:
        raise ImportError_("no gcl_collect* keys — not a Node2Vec state dict")
    params: Params = {
        "v_embedding": _embedding(tr, "v_embedding"),
        "size_embedding": _embedding(tr, "size_embedding"),
        "f_embedding": _sequential(tr, "f_embedding"),
        "projection": _sequential(tr, "projection", (0, 2, 4)),
        "output": _sequential(tr, "output"),
    }
    for ph in ("collect", "reverse", "back"):
        for i in range(n_layers):
            params[f"gcl_{ph}{i}"] = _fine_egcl(tr, f"gcl_{ph}{i}")
    emb = params["v_embedding"]["embedding"]
    fe = params["f_embedding"]["layers_0"]["kernel"]
    inferred = {
        "hidden_size": int(emb.shape[1]),
        "feature_size": int(fe.shape[0]),
        "vocab_size": int(emb.shape[0]) - 1,   # +1 masked-node token
        "n_layers": n_layers,
    }
    return params, inferred, tr.leftovers()


CONVERTERS = {"coarse": convert_coarse, "denoise": convert_denoise,
              "refine": convert_refine}


# --------------------------------------------------------------------------
# export: our flax params -> reference torch state-dict layout (the exact
# inverse of the converters above; pinned by the roundtrip tests). Lets a
# user take weights trained here back into the reference's tooling.
# --------------------------------------------------------------------------


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _exp_linear(out: StateDict, prefix: str, p: Params):
    out[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _exp_sequential(out: StateDict, prefix: str, p: Params):
    for name, sub in p.items():
        idx = name.split("_")[1]
        _exp_linear(out, f"{prefix}.{idx}", sub)


def _exp_coarse_gcl(out: StateDict, prefix: str, p: Params):
    w0 = np.concatenate([_np(p["edge_in_w_src"]).T, _np(p["edge_in_w_dst"]).T,
                         _np(p["edge_in_w_e"]).T], axis=1)
    out[f"{prefix}.edge_mlp.0.weight"] = w0
    out[f"{prefix}.edge_mlp.0.bias"] = _np(p["edge_in_bias"])
    out[f"{prefix}.edge_mlp.2.weight"] = _np(p["edge_out_kernel"]).T
    out[f"{prefix}.edge_mlp.2.bias"] = _np(p["edge_out_bias"])
    out[f"{prefix}.node_mlp.0.weight"] = _np(p["node_in_kernel"]).T
    out[f"{prefix}.node_mlp.0.bias"] = _np(p["node_in_bias"])
    out[f"{prefix}.node_mlp.2.weight"] = _np(p["node_out_kernel"]).T
    out[f"{prefix}.node_mlp.2.bias"] = _np(p["node_out_bias"])
    if "att_kernel" in p:
        out[f"{prefix}.att_mlp.0.weight"] = _np(p["att_kernel"]).T
        out[f"{prefix}.att_mlp.0.bias"] = _np(p["att_bias"])


def _exp_coarse_equiv(out: StateDict, prefix: str, p: Params):
    w0 = np.concatenate([_np(p["coord_in_w_src"]).T, _np(p["coord_in_w_dst"]).T,
                         _np(p["coord_in_w_e"]).T], axis=1)
    out[f"{prefix}.coord_mlp.0.weight"] = w0
    out[f"{prefix}.coord_mlp.0.bias"] = _np(p["coord_in_bias"])
    out[f"{prefix}.coord_mlp.2.weight"] = _np(p["coord_mid_kernel"]).T
    out[f"{prefix}.coord_mlp.2.bias"] = _np(p["coord_mid_bias"])
    out[f"{prefix}.coord_mlp.4.weight"] = _np(p["coord_head_kernel"]).T


def _exp_fine_egcl(out: StateDict, prefix: str, p: Params):
    cols = [_np(p["mes_src"]["kernel"]).T, _np(p["mes_dst"]["kernel"]).T,
            _np(p["mes_rad"]["kernel"]).T]
    if "mes_e" in p:
        cols.append(_np(p["mes_e"]["kernel"]).T)
    out[f"{prefix}.mes_mlp.0.weight"] = np.concatenate(cols, axis=1)
    out[f"{prefix}.mes_mlp.0.bias"] = _np(p["mes_src"]["bias"])
    _exp_linear(out, f"{prefix}.mes_mlp.2", p["mes_out"])
    _exp_linear(out, f"{prefix}.node_mlp.0", p["node_in"])
    _exp_linear(out, f"{prefix}.node_mlp.2", p["node_out"])
    _exp_linear(out, f"{prefix}.coord_mlp.0", p["coord_in"])
    out[f"{prefix}.coord_mlp.2.weight"] = _np(p["coord_head"]["kernel"]).T
    if "att" in p:
        _exp_linear(out, f"{prefix}.att_mlp.0", p["att"])
    if "edge_in" in p:
        _exp_linear(out, f"{prefix}.edge_mlp.0", p["edge_in"])
        _exp_linear(out, f"{prefix}.edge_mlp.2", p["edge_out"])


def _exp_coarse_extras(out: StateDict, params: Params):
    if "gamma" in params:
        for l in ("l1", "l2", "l3"):
            _exp_linear(out, f"gamma.{l}", params["gamma"][l])
        out["gamma.gamma_0"] = _np(params["gamma"]["gamma_0"])
        out["gamma.gamma_1"] = _np(params["gamma"]["gamma_1"])
    if "pocket_embed" in params:
        out["pocket_embed.weight"] = _np(params["pocket_embed"]["embedding"])


def export_coarse(params: Params) -> StateDict:
    """CoarseDiffusion params -> DiffusionQM9 state-dict layout."""
    out: StateDict = {}
    if "gnn" in params["dynamics"]:
        # mode='gnn_dynamics' backbone (egnn_new.py:208-242)
        gnn = params["dynamics"]["gnn"]
        _exp_linear(out, "dynamics.gnn.embedding", gnn["embedding"])
        _exp_linear(out, "dynamics.gnn.embedding_out", gnn["embedding_out"])
        for gname, gp in gnn.items():
            if gname.startswith("gcl_"):
                _exp_coarse_gcl(out, f"dynamics.gnn.{gname}", gp)
        _exp_coarse_extras(out, params)
        return out
    egnn = params["dynamics"]["egnn"]
    _exp_linear(out, "dynamics.egnn.embedding", egnn["embedding"])
    _exp_linear(out, "dynamics.egnn.embedding_out", egnn["embedding_out"])
    for bname, bp in egnn.items():
        if not bname.startswith("e_block_"):
            continue
        for gname, gp in bp.items():
            prefix = f"dynamics.egnn.{bname}.{gname}"
            if gname == "gcl_equiv":
                _exp_coarse_equiv(out, prefix, gp)
            else:
                _exp_coarse_gcl(out, prefix, gp)
    _exp_coarse_extras(out, params)
    return out


def export_denoise(params: Params) -> StateDict:
    """EdgeDenoise params -> Edge_denoise state-dict layout."""
    out: StateDict = {}
    for ours, theirs in [("feature_embedding", "feature_embedding"),
                         ("edge_embedding", "edge_embedding"),
                         ("node_embedding", "node_embedding")]:
        _exp_linear(out, theirs, params[ours])
    out["vocab_embedding.weight"] = _np(params["vocab_embedding"]["embedding"])
    for ours, theirs in [("focal_head", "focal_predict"),
                         ("edge_head", "edge_predict"),
                         ("node_head", "node_predict")]:
        _exp_sequential(out, theirs, params[ours])
    for name, p in params.items():
        if name.startswith(("gcl_full_", "gcl_focal_")) or \
                name in ("gcl_edge", "gcl_denoise"):
            _exp_fine_egcl(out, name, p)
    return out


def export_refine(params: Params) -> StateDict:
    """NodeRefine params -> Node2Vec state-dict layout."""
    out: StateDict = {}
    out["v_embedding.weight"] = _np(params["v_embedding"]["embedding"])
    out["size_embedding.weight"] = _np(params["size_embedding"]["embedding"])
    for name in ("f_embedding", "projection", "output"):
        _exp_sequential(out, name, params[name])
    for name, p in params.items():
        if name.startswith("gcl_"):
            _exp_fine_egcl(out, name, p)
    return out


EXPORTERS = {"coarse": export_coarse, "denoise": export_denoise,
             "refine": export_refine}


def detect_stage(sd: StateDict) -> Optional[str]:
    if any(k.startswith("dynamics.egnn.") or k.startswith("dynamics.gnn.")
           for k in sd):
        return "coarse"
    if any(k.startswith("gcl_full_") for k in sd):
        return "denoise"
    if any(k.startswith("gcl_collect") for k in sd):
        return "refine"
    return None
