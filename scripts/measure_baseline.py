"""Measure the reference implementation's coarse-sampling cost (denominator
for bench.py's vs_baseline).

The reference's sampling wall-clock is dominated by 1000 strictly sequential
EGNN forwards per batch (SURVEY.md §3.2); its full pipeline cannot run here
(no pytorch_lightning/hydra/rdkit), so we time exactly that hot loop by
importing the reference's own EGNN module from the read-only mount — no code
is copied — at the published sampling config (endiffusion/conf/model/
ddpmgblur.yaml: hidden 256, 6 layers, attention+tanh; sample batch from
endiffusion/conf/sample/default.yaml).

Writes BASELINE_MEASURED.json at the repo root.
"""

import importlib.util
import json
import sys
import time
from pathlib import Path

import torch

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent


def load_reference_egnn():
    spec = importlib.util.spec_from_file_location(
        "ref_egnn_new", REF / "endiffusion/models/layers/egnn_new.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def fully_connected_edges(n_nodes: int, batch_size: int):
    rows, cols = [], []
    for b in range(batch_size):
        for i in range(n_nodes):
            for j in range(n_nodes):
                rows.append(i + b * n_nodes)
                cols.append(j + b * n_nodes)
    return [torch.LongTensor(rows), torch.LongTensor(cols)]


def time_reference_sampling(batch_size=2, n_nodes=12, steps=1000, hidden=256,
                            layers=6, in_nf=9, warmup=3, measure=None):
    """Seconds per `steps`-step reverse process for one batch."""
    mod = load_reference_egnn()
    torch.manual_seed(0)
    egnn = mod.EGNN(in_node_nf=in_nf, in_edge_nf=1, hidden_nf=hidden,
                    n_layers=layers, attention=True, tanh=True,
                    inv_sublayers=2, normalization_factor=10,
                    aggregation_method="sum", coords_range=30, norm_constant=0)
    egnn.eval()
    bn = batch_size * n_nodes
    edges = fully_connected_edges(n_nodes, batch_size)
    node_mask = torch.ones(bn, 1)
    edge_mask = (1 - torch.eye(n_nodes)).repeat(batch_size, 1).reshape(bn * n_nodes, 1)
    h = torch.randn(bn, in_nf)
    x = torch.randn(bn, 3)

    with torch.no_grad():
        for _ in range(warmup):
            egnn(h, x, edges, node_mask=node_mask, edge_mask=edge_mask)
        n_meas = measure or steps
        t0 = time.perf_counter()
        for _ in range(n_meas):
            h_out, x_out = egnn(h, x, edges, node_mask=node_mask, edge_mask=edge_mask)
        dt = time.perf_counter() - t0
    return dt * (steps / n_meas)


def main():
    cfgs = {
        # reference default: sample batch_size=2 (conf/sample/default.yaml)
        "ref_batch2_n12_T1000": dict(batch_size=2, n_nodes=12),
        # driver config: 64 point sets <=12 nodes
        "ref_batch64_n12_T1000": dict(batch_size=64, n_nodes=12),
    }
    out = {"hardware": "torch-2.13-cpu (reference GPU env unavailable)",
           "method": "timed 1000 sequential reference-EGNN forwards (the sampling hot loop, SURVEY §3.2)"}
    for name, cfg in cfgs.items():
        secs = time_reference_sampling(**cfg, measure=25)
        mols = cfg["batch_size"]
        out[name] = {"seconds_per_batch": round(secs, 3),
                     "molecules_per_sec": round(mols / secs, 4)}
        print(name, out[name])
    with open(REPO / "BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote BASELINE_MEASURED.json")


if __name__ == "__main__":
    main()
