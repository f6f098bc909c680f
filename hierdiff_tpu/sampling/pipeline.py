"""End-to-end generation pipeline: coarse EDM -> AR assembly -> reconstruction.

The TPU equivalent of running sampler.py + ar_sampling_nosize.py +
reconstruct.py in sequence (readme.md:40-66), as one callable:

1. coarse: batched 1000-step lax.scan sampling of blurred fragment point sets
   (node counts from the GEOM histogram prior);
2. fine: fleet-batched beam search assembling junction trees on device;
3. reconstruct: host-side RDKit geometry-scored assembly (optional — skipped
   without RDKit, returning assembled trees).

Integer blur features are rounded at the stage-1/2 hand-off exactly like the
reference (ar_sampling_nosize.py:388).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from hierdiff_tpu.chem import HAS_RDKIT
from hierdiff_tpu.models.diffusion import CoarseDiffusion
from hierdiff_tpu.models.edge_denoise import EdgeDenoise
from hierdiff_tpu.ops.distributions import DistributionNodes
from hierdiff_tpu.sampling.ar import ARSampler, TreeState
from hierdiff_tpu.sampling.coarse import make_masks_for_counts, sample_coarse


@dataclasses.dataclass
class PipelineResult:
    blur: List[Dict[str, np.ndarray]]
    trees: List[Optional[TreeState]]
    molecules: Optional[list] = None       # [(mol, amap, smiles)] with RDKit
    stats: Optional[dict] = None


class GenerationPipeline:
    def __init__(self, coarse_model: CoarseDiffusion, coarse_params,
                 denoise_model: EdgeDenoise, denoise_params,
                 histogram: Dict[int, int], beam_size: int = 5,
                 int_nf: int = 5, refine_hook=None, can_assemble=None,
                 vocab=None, max_n_cap: Optional[int] = None):
        self.coarse_model = coarse_model
        self.coarse_params = coarse_params
        self.nodes_dist = DistributionNodes(histogram)
        self.sampler = ARSampler(denoise_model, denoise_params, beam_size=beam_size,
                                 can_assemble=can_assemble, refine_hook=refine_hook)
        self.int_nf = int_nf
        self.vocab = vocab
        self.max_n_cap = max_n_cap

    def sample_blur(self, rng_key, n_molecules: int, max_n: Optional[int] = None,
                    rng_np: Optional[np.random.Generator] = None) -> List[Dict[str, np.ndarray]]:
        """Stage 1: coarse point clouds (sizes from the histogram prior)."""
        rng_np = rng_np or np.random.default_rng(0)
        counts = self.nodes_dist.sample_np(rng_np, n_molecules)
        if self.max_n_cap:
            counts = np.minimum(counts, self.max_n_cap)
        nm, em = make_masks_for_counts(counts, max_n)
        x, h = sample_coarse(self.coarse_model, self.coarse_params, rng_key,
                             nm, em)
        x, h = np.asarray(x), np.asarray(h)
        out = []
        for i, c in enumerate(counts):
            hi = h[i, :c]
            # round integer blur dims at hand-off (ar_sampling_nosize.py:388)
            hi = np.concatenate([np.round(hi[:, : self.int_nf]), hi[:, self.int_nf:]], axis=1)
            out.append({"x": x[i, :c], "h": hi})
        return out

    def run(self, rng_key, n_molecules: int, reconstruct: bool = True,
            n_workers: int = 0) -> PipelineResult:
        rng_np = np.random.default_rng(int(jax.random.randint(rng_key, (), 0, 2**31 - 1)))
        blur = self.sample_blur(jax.random.fold_in(rng_key, 1), n_molecules, rng_np=rng_np)
        trees = self.sampler.sample(blur)
        # end-of-search repair of non-assemblable fragments
        # (reference: model_refine.py:252-299 check_final_tree)
        hook = self.sampler.refine_hook
        if hook is not None and hasattr(hook, "finalize"):
            trees = [hook.finalize(t) if t is not None else None for t in trees]
        result = PipelineResult(blur=blur, trees=trees)
        if reconstruct and HAS_RDKIT and self.vocab is not None:
            from hierdiff_tpu.chem.reconstruct import reconstruct_batch
            mol_trees = [t for t in trees if t is not None]
            jt = [tree_state_to_moltree(t, self.vocab) for t in mol_trees]
            result.molecules, result.stats = reconstruct_batch(jt, self.vocab, n_workers)
        return result


def tree_state_to_moltree(state: TreeState, vocab):
    """Convert a beam-search TreeState into a chem.MolTree for reconstruction."""
    from hierdiff_tpu.chem.mol_tree import MolTree, MolTreeNode

    nodes = []
    for i in range(state.n):
        wid = int(state.wids[i])
        smiles = vocab.get_smiles(wid)
        nodes.append(MolTreeNode(smiles, state.pos[i], vocab=vocab,
                                 hbd=float(state.feats[i, 0])))
    adj = state.adj.copy()
    np.fill_diagonal(adj, 0)
    edge_index = np.nonzero(adj)
    return MolTree(nodes=nodes, edge_index=edge_index)
