"""Unified typed configuration for all three stages.

Replaces the reference's split config world (Hydra for the coarse stage,
yaml+easydict for the fine stage — SURVEY §5) with one dataclass tree,
loadable from YAML with dotted overrides:

    cfg = load_config("configs/coarse_geom.yaml", ["train.batch_size=32"])

Field names and defaults mirror the reference configs
(endiffusion/conf/model/ddpmgblur.yaml, conf/model/edge_denoise.yaml,
conf/model/refine.yaml) so a reference user can map settings 1:1.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple

import yaml


@dataclass
class CoarseModelConfig:
    """ddpmgblur.yaml equivalents."""

    node_coarse_type: str = "prop"       # 'prop' (8 feats) | 'elem' (3)
    loss_type: str = "vlb"
    noise_schedule: str = "learned"
    timesteps: int = 1000
    noise_precision: float = 1e-4
    norm_values: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    norm_biases: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    hidden_nf: int = 256
    n_layers: int = 6
    inv_sublayers: int = 2
    attention: bool = True
    tanh: bool = True
    coords_range: float = 30.0
    norm_constant: float = 0.0
    normalization_factor: float = 10.0
    aggregation_method: str = "sum"
    condition_time: bool = True
    context_node_nf: int = 0
    # ddpmgblur.yaml:32,35 — off in the live config but reachable
    mode: str = "egnn_dynamics"          # 'egnn_dynamics' | 'gnn_dynamics'
    sin_embedding: bool = False          # sinusoidal distance embedding
    remat: bool = False
    remat_edges: bool = False            # jax.checkpoint around the (B,N,N,H) edge chain only
    use_pallas: bool = False             # fused EGNN inference kernels (ops/egnn_pallas.py)
    pallas_vjp: bool = False             # fused custom-VJP training path (VMEM-remat backward)
    compute_dtype: Optional[str] = None  # 'bfloat16' = bf16 matmul operands, f32 accum
    dataset: str = "geom"                # geom | qm9 | crossdock (node-count histogram)
    pocket: bool = False                 # pocket-conditioned (crossdock) variant
    pocket_cross_edges: bool = True      # mol<->pocket edges (False = reference-exact mask)

    @property
    def in_node_nf(self) -> int:
        return 8 if self.node_coarse_type == "prop" else 3

    @property
    def int_nf(self) -> int:
        """Integer-valued h dims (diffusion_qm9.py:462-467)."""
        return 5 if self.node_coarse_type == "prop" else 3

    @property
    def cont_nf(self) -> int:
        return 3 if self.node_coarse_type == "prop" else 0


@dataclass
class EdgeDenoiseConfig:
    """conf/model/edge_denoise.yaml equivalents."""

    vocab_size: int = 781
    out_node_nf: int = 780
    in_node_nf: int = 8
    hidden_nf: int = 256
    n_layers_full: int = 3
    n_layers_focal: int = 3
    focal_loss: float = 5.0
    edge_loss: float = 1.0
    node_loss: float = 2.0
    full_softmax: bool = True
    vocab_conditioning: bool = False


@dataclass
class RefineConfig:
    """conf/model/refine.yaml equivalents."""

    vocab_size: int = 780
    feature_size: int = 8
    hidden_size: int = 256
    n_layers: int = 2


@dataclass
class OptimConfig:
    optimizer: str = "adamw"
    lr: float = 4.0e-4
    weight_decay: float = 4.0e-8
    grad_clip: Optional[float] = 1.0
    schedule: str = "constant"          # constant | cosine | step
    warmup_steps: int = 0
    decay_steps: int = 100_000
    step_size: int = 15                  # StepLR epochs (reference scheduler/step.yaml)
    step_gamma: float = 0.1
    ema_decay: float = 0.999


@dataclass
class TrainConfig:
    batch_size: int = 64
    max_steps: int = 10_000
    eval_every: int = 500
    checkpoint_every: int = 1000
    log_every: int = 50
    seed: int = 2022
    workdir: str = "runs/default"
    data: str = "synthetic"              # 'synthetic' | path to preprocessed trees
    data_split: str = ""                 # optional JSON file list (scripts/split_for_denoise.py)
    num_train_trees: int = 4096          # synthetic pool size
    buckets: Tuple[int, ...] = (8, 16, 24, 32, 48, 64, 96)


@dataclass
class Config:
    stage: str = "coarse"                # coarse | denoise | refine
    coarse: CoarseModelConfig = field(default_factory=CoarseModelConfig)
    denoise: EdgeDenoiseConfig = field(default_factory=EdgeDenoiseConfig)
    refine: RefineConfig = field(default_factory=RefineConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


def _apply(obj: Any, key: str, value: Any):
    parts = key.split(".")
    tgt = obj
    for p in parts[:-1]:
        tgt = getattr(tgt, p)
    name = parts[-1]
    cur = getattr(tgt, name)
    if isinstance(cur, bool):
        value = value in (True, "true", "True", "1", 1)
    elif isinstance(cur, int) and not isinstance(value, bool):
        value = int(value)
    elif isinstance(cur, float):
        value = float(value)
    elif isinstance(cur, tuple):
        if isinstance(value, str):
            value = tuple(type(cur[0])(v) for v in value.strip("()[]").split(",")
                          if v.strip())
        else:
            value = tuple(value)
    setattr(tgt, name, value)


def _update_from_dict(cfg: Any, d: dict, prefix: str = ""):
    for k, v in d.items():
        if isinstance(v, dict):
            _update_from_dict(cfg, v, f"{prefix}{k}.")
        else:
            _apply(cfg, f"{prefix}{k}", v)


def load_config(path: Optional[str] = None, overrides: Sequence[str] = ()) -> Config:
    cfg = Config()
    if path:
        with open(path) as f:
            _update_from_dict(cfg, yaml.safe_load(f) or {})
    for ov in overrides:
        key, _, val = ov.partition("=")
        _apply(cfg, key.strip(), yaml.safe_load(val))
    return cfg


def config_to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)
