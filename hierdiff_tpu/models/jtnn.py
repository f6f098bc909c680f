"""JT-VAE neural stack: tree-GRU encoder/decoder and atom-level MPN/JTMPN.

TPU-native rebuild of the reference's JTNN modules
(generation/jtnn/jtnn_enc.py:8, jtnn_dec.py:13, mpn.py:85, jtmpn.py:30,
nnutils.py:25). In the HierDiff pipeline these are constructed but unused at
sample time (the geometry-scored decode in chem/reconstruct.py replaces the
neural scoring; encoder weights are random in the reference) — they are
rebuilt here so the full JT-VAE surface exists as trainable TPU modules.

Design (idiomatic JAX, no message dicts / ragged Python loops):

- ``tree_gru``: the exact nnutils.GRU cell over aggregate tensors.
- ``JTNNEncoder``: junction trees are TREES, so the directed edge messages
  h[(x, parent x)] ("up") and h[(parent y, y)] ("down") are PER-NODE
  tensors. The two propagation phases of the reference's get_prop_order
  (leaf->root then root->leaf) become two ``lax.scan``s over BFS depth with
  one-hot parent scatter/gather on the MXU; the per-neighbor reset gates
  are aggregated per node and the message toward y excludes y via a
  subtract-the-target identity (valid because the gate input is the same
  node embedding for every neighbor term).
- ``JTNNDecoder``: teacher-forced forward over a host-built DFS trace
  program (build_trace == jtnn_dec.dfs); one scan step per trace edge with
  one-hot edge-message updates; stop/pred losses masked-accumulated.
- ``MPN`` / ``JTMPN``: dense masked directed-bond message passing
  (B, A, A, H) with the standard exclude-reverse-edge subtraction; the
  featurization (RDKit-gated) reproduces mpn.py's atom/bond one-hots.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hierdiff_tpu.ops.egnn import torch_linear_init
from hierdiff_tpu.ops.gcl import compute_parents
from hierdiff_tpu.ops.graph import bfs_depths

Array = jax.Array

HIGHEST = jax.lax.Precision.HIGHEST


def _sel(onehot: Array, t: Array) -> Array:
    """Row-select t[b, idx] as a one-hot MXU contraction (bit-exact)."""
    return jax.lax.dot_general(onehot, t, (((2,), (1,)), ((0,), (0,))),
                               precision=HIGHEST)


def _scatter(onehot: Array, t: Array) -> Array:
    """Scatter-add t's rows onto their one-hot targets: out[b, j] += t[b, n]
    where onehot[b, n, j] = 1."""
    return jnp.einsum("bnh,bnj->bjh", t, onehot, precision=HIGHEST)


class TreeGRUCell(nn.Module):
    """nnutils.GRU with per-node aggregate inputs.

    The reference cell over a padded neighbor list
    (nnutils.py:25-40):  z = sigma(W_z[x, sum_h]);
    r_i = sigma(W_r x + U_r h_i); pre = tanh(W_h[x, sum_i r_i h_i]);
    new_h = (1-z) sum_h + z pre.  Callers supply sum_h and the
    gate-weighted sum directly (aggregated with the subtract-the-target
    exclusion), which is exactly equivalent.
    """

    hidden_size: int

    def setup(self):
        h = self.hidden_size
        self.W_z = nn.Dense(h, kernel_init=torch_linear_init, name="W_z")
        self.W_r = nn.Dense(h, use_bias=False, kernel_init=torch_linear_init, name="W_r")
        self.U_r = nn.Dense(h, kernel_init=torch_linear_init, name="U_r")
        self.W_h = nn.Dense(h, kernel_init=torch_linear_init, name="W_h")

    def gate_term(self, x_emb: Array, h_i: Array) -> Array:
        """sigma(W_r x + U_r h_i) * h_i for one neighbor message."""
        return nn.sigmoid(self.W_r(x_emb) + self.U_r(h_i)) * h_i

    def __call__(self, x_emb: Array, sum_h: Array, sum_gated: Array) -> Array:
        z = nn.sigmoid(self.W_z(jnp.concatenate([x_emb, sum_h], axis=-1)))
        pre = jnp.tanh(self.W_h(jnp.concatenate([x_emb, sum_gated], axis=-1)))
        return (1.0 - z) * sum_h + z * pre


class JTNNEncoder(nn.Module):
    """Tree-GRU encoder. (reference: jtnn_enc.py:8-72)

    Inputs: wids (B, N) vocab ids, adj (B, N, N) 0/1 tree adjacency,
    node_mask (B, N, 1); node 0 is the root (MolTree convention).
    Returns (up, down, root_vecs): up[b, x] = h[(x, parent x)],
    down[b, y] = h[(parent y, y)] — together all 2(N-1) directed edge
    messages of the reference's h dict — and root_vecs (B, H).
    """

    vocab_size: int = 780
    hidden_size: int = 450

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.hidden_size)
        self.gru = TreeGRUCell(self.hidden_size, name="gru")
        self.W = nn.Dense(self.hidden_size, kernel_init=torch_linear_init, name="W")

    def __call__(self, wids: Array, adj: Array, node_mask: Array):
        b, n = wids.shape
        mask = node_mask[..., 0]
        adj = adj * (1.0 - jnp.eye(n))[None]
        root = jnp.zeros((b, n), bool).at[:, 0].set(True)
        depth = bfs_depths(adj, root)                     # (B, N), root=0
        parent = compute_parents(adj, depth)              # (B, N) int32
        onehot_parent = jax.nn.one_hot(parent, n, dtype=adj.dtype)
        has_parent = (depth >= 1) & (mask > 0)
        hp = has_parent.astype(adj.dtype)[..., None]
        maxd = jnp.max(jnp.where(mask > 0, depth, 0), axis=1)    # (B,)

        emb = self.embedding(jnp.clip(wids, 0, self.vocab_size - 1).astype(jnp.int32))
        emb = emb * node_mask
        emb_parent = _sel(onehot_parent, emb)

        if self.is_initializing():
            # materialize the GRU params outside lax.scan (flax cannot
            # create variables inside a scanned body)
            zero = jnp.zeros_like(emb)
            self.gru(emb, zero, self.gru.gate_term(emb, zero))

        # --- up phase (leaf -> root): up[x] = GRU(emb_x, {up[c]: c child}) --
        def up_step(up, k):
            # per-sample alignment: iteration k processes depth maxd_i - k
            active = (depth == (maxd[:, None] - k)) & has_parent
            am = active.astype(adj.dtype)[..., None]
            gated_c = self.gru.gate_term(emb_parent, up) * hp   # per child c
            sum_h = _scatter(onehot_parent, up * hp)            # onto parents
            sum_g = _scatter(onehot_parent, gated_c)
            new = self.gru(emb, sum_h, sum_g)
            return up * (1 - am) + new * am, ()

        up0 = jnp.zeros((b, n, self.hidden_size))
        up, _ = jax.lax.scan(up_step, up0, jnp.arange(n))

        # --- down phase (root -> leaf): down[y] = GRU(emb_x, nei(x) \ {y}) --
        # where x = parent(y); nei(x) = children(x) + parent(x).
        child_sum = _scatter(onehot_parent, up * hp)
        child_gated = _scatter(onehot_parent, self.gru.gate_term(emb_parent, up) * hp)

        def down_step(down, k):
            active = (depth == (k + 1)) & has_parent        # y at depth k+1
            am = active.astype(adj.dtype)[..., None]
            # aggregates at x = parent(y), excluding y's own up message and
            # including x's down message (zero for the root)
            sum_at_x = _sel(onehot_parent, child_sum + down * hp)
            g_down_x = _sel(onehot_parent,
                            self.gru.gate_term(emb, down) * hp)
            gsum_at_x = _sel(onehot_parent, child_gated) + g_down_x
            sum_excl = sum_at_x - up
            gsum_excl = gsum_at_x - self.gru.gate_term(emb_parent, up)
            new = self.gru(emb_parent, sum_excl, gsum_excl)
            return down * (1 - am) + new * am, ()

        down0 = jnp.zeros((b, n, self.hidden_size))
        down, _ = jax.lax.scan(down_step, down0, jnp.arange(n))

        up = up * hp
        down = down * hp

        # root aggregate (jtnn_enc.py node_aggregate): incoming = children up
        sum_root = _scatter(onehot_parent, up)[:, 0]
        root_vecs = nn.relu(self.W(jnp.concatenate([emb[:, 0], sum_root], axis=-1)))
        return up, down, root_vecs


def build_trace(adj: np.ndarray) -> List[Tuple[int, int, int]]:
    """DFS edge trace from node 0: [(x, y, direction)] with each tree edge
    visited forward (1) then backward (0). (reference: jtnn_dec.py:283-289)
    """
    n = adj.shape[0]
    trace: List[Tuple[int, int, int]] = []

    def dfs(x: int, fa: int):
        for y in range(n):
            if adj[x, y] > 0 and y != fa:
                trace.append((x, y, 1))
                dfs(y, x)
                trace.append((y, x, 0))

    dfs(0, -1)
    return trace


def collate_traces(adjs: List[np.ndarray], max_n: int) -> Dict[str, np.ndarray]:
    """Pad per-tree DFS traces into step tensors for JTNNDecoder."""
    b = len(adjs)
    traces = [build_trace(a) for a in adjs]
    t_max = max((len(t) for t in traces), default=1)
    x_idx = np.zeros((t_max, b), np.int32)
    y_idx = np.zeros((t_max, b), np.int32)
    direction = np.zeros((t_max, b), np.float32)
    active = np.zeros((t_max, b), np.float32)
    for i, tr in enumerate(traces):
        for t, (x, y, d) in enumerate(tr):
            x_idx[t, i], y_idx[t, i], direction[t, i], active[t, i] = x, y, d, 1.0
    return {"x_idx": x_idx, "y_idx": y_idx, "direction": direction,
            "active": active}


class JTNNDecoder(nn.Module):
    """Teacher-forced tree decoder. (reference: jtnn_dec.py:13-188)

    forward(wids, node_mask, trace, mol_vec) -> dict with pred_loss,
    stop_loss, pred_acc, stop_acc — the reference's four outputs. The
    greedy neural ``decode`` is intentionally NOT rebuilt: HierDiff decodes
    a *specified* tree with geometry scoring (chem/reconstruct.py), the
    reference's own pipeline never calls the neural decode
    (jtnn_vae.py:210 spec_tree path).
    """

    vocab_size: int = 780
    hidden_size: int = 450
    latent_size: int = 56

    def setup(self):
        h = self.hidden_size
        self.embedding = nn.Embed(self.vocab_size, h)
        self.gru = TreeGRUCell(h, name="gru")
        self.W = nn.Dense(h, kernel_init=torch_linear_init, name="W")
        self.U = nn.Dense(h, kernel_init=torch_linear_init, name="U")
        self.W_o = nn.Dense(self.vocab_size, kernel_init=torch_linear_init, name="W_o")
        self.U_s = nn.Dense(1, kernel_init=torch_linear_init, name="U_s")

    def __call__(self, wids: Array, node_mask: Array, trace: Dict[str, Array],
                 mol_vec: Array):
        b, n = wids.shape
        h = self.hidden_size
        emb_all = self.embedding(jnp.clip(wids, 0, self.vocab_size - 1)
                                 .astype(jnp.int32)) * node_mask

        if self.is_initializing():
            zero = jnp.zeros((b, h))
            self.gru(zero, zero, self.gru.gate_term(zero, zero))

        def step(M, tr):
            # M (B, N, N, H): M[b, z, x] = message z->x (zero until sent)
            ox = jax.nn.one_hot(tr["x_idx"], n)            # (B, N)
            oy = jax.nn.one_hot(tr["y_idx"], n)
            am = tr["active"][:, None]
            emb_x = jnp.einsum("bn,bnh->bh", ox, emb_all)
            # incoming messages to x, as per-source rows (B, N, H); entries
            # never sent are zero, so summing over all N == summing over the
            # reference's incrementally-built neighbor list
            inc = jnp.einsum("bznh,bn->bzh", M, ox)
            m_yx = jnp.einsum("bzh,bz->bh", inc, oy)        # message y->x
            sum_h = jnp.sum(inc, axis=1) - m_yx
            gated = nn.sigmoid(self.gru.W_r(emb_x)[:, None] + self.gru.U_r(inc)) * inc
            sum_g = (jnp.sum(gated, axis=1)
                     - nn.sigmoid(self.gru.W_r(emb_x) + self.gru.U_r(m_yx)) * m_yx)
            new_h = self.gru(emb_x, sum_h, sum_g)
            # stop head sees ALL neighbors of x (incl. y's message if any)
            cur_o = jnp.sum(inc, axis=1)
            stop_hidden = jnp.concatenate([emb_x, cur_o, mol_vec], axis=-1)
            M = M + (new_h[:, None, None, :] - M) * (ox[:, :, None, None]
                                                    * oy[:, None, :, None]) * am[..., None, None]
            return M, (new_h, stop_hidden)

        M0 = jnp.zeros((b, n, n, h))
        M, (new_hs, stop_hiddens) = jax.lax.scan(step, M0, trace)
        t_max = trace["active"].shape[0]

        # --- clique (pred) loss: root prediction + every forward step ------
        wid_y = jnp.einsum(
            "tbn,bn->tb", jax.nn.one_hot(trace["y_idx"], n),
            wids.astype(jnp.float32)).astype(jnp.int32)
        pred_mask = trace["direction"] * trace["active"]          # (T, B)
        root_hidden = jnp.concatenate([jnp.zeros((b, h)), mol_vec], axis=-1)
        step_hidden = jnp.concatenate(
            [new_hs, jnp.broadcast_to(mol_vec, (t_max, b, mol_vec.shape[-1]))], axis=-1)
        pred_hidden = jnp.concatenate([root_hidden[None], step_hidden], axis=0)
        pred_scores = self.W_o(nn.relu(self.W(pred_hidden)))      # (T+1, B, V)
        pred_targets = jnp.concatenate([wids[None, :, 0], wid_y], axis=0)
        pred_w = jnp.concatenate([jnp.ones((1, b)), pred_mask], axis=0)

        logp = jax.nn.log_softmax(pred_scores, axis=-1)
        tgt_onehot = jax.nn.one_hot(pred_targets, self.vocab_size)
        pred_loss = -jnp.sum(jnp.sum(logp * tgt_onehot, axis=-1) * pred_w) / b
        pred_hit = (jnp.argmax(pred_scores, axis=-1) == pred_targets)
        pred_acc = jnp.sum(pred_hit * pred_w) / jnp.maximum(jnp.sum(pred_w), 1.0)

        # --- stop loss: every trace step + the final root stop -------------
        # final root stop: x = root, all incoming messages, target 0
        inc_root = M[:, :, 0]                                      # (B, N, H)
        root_stop = jnp.concatenate(
            [emb_all[:, 0], jnp.sum(inc_root, axis=1), mol_vec], axis=-1)
        stop_hiddens = jnp.concatenate([stop_hiddens, root_stop[None]], axis=0)
        stop_scores = self.U_s(nn.relu(self.U(stop_hiddens)))[..., 0]  # (T+1, B)
        stop_targets = jnp.concatenate([trace["direction"],
                                        jnp.zeros((1, b))], axis=0)
        stop_w = jnp.concatenate([trace["active"], jnp.ones((1, b))], axis=0)
        bce = (jnp.maximum(stop_scores, 0) - stop_scores * stop_targets
               + jnp.log1p(jnp.exp(-jnp.abs(stop_scores))))
        stop_loss = jnp.sum(bce * stop_w) / b
        stop_hit = ((stop_scores >= 0).astype(jnp.float32) == stop_targets)
        stop_acc = jnp.sum(stop_hit * stop_w) / jnp.maximum(jnp.sum(stop_w), 1.0)

        return {"pred_loss": pred_loss, "stop_loss": stop_loss,
                "pred_acc": pred_acc, "stop_acc": stop_acc,
                "loss": pred_loss + stop_loss}


# --------------------------------------------------------------------------
# atom-level message passing (MPN / JTMPN)
# --------------------------------------------------------------------------

ELEM_LIST = ["C", "N", "O", "S", "F", "Si", "P", "Cl", "Br", "Mg", "Na",
             "Ca", "Fe", "Al", "I", "B", "K", "Se", "Zn", "H", "Cu", "Mn",
             "unknown"]
ATOM_FDIM = len(ELEM_LIST) + 6 + 5 + 4 + 1
BOND_FDIM = 5 + 6


def _onek(x, allowed) -> List[float]:
    if x not in allowed:
        x = allowed[-1]
    return [1.0 if x == s else 0.0 for s in allowed]


def atom_features(atom) -> np.ndarray:
    """(mpn.py:20-25)"""
    aromatic = atom.GetIsAromatic() if hasattr(atom, "GetIsAromatic") else False
    return np.asarray(
        _onek(atom.GetSymbol(), ELEM_LIST)
        + _onek(atom.GetDegree(), [0, 1, 2, 3, 4, 5])
        + _onek(atom.GetFormalCharge(), [-1, -2, 1, 2, 0])
        + _onek(int(atom.GetChiralTag()), [0, 1, 2, 3])
        + [1.0 if aromatic else 0.0], np.float32)


def bond_features(bond) -> np.ndarray:
    """(mpn.py:27-32)"""
    bt = float(bond.GetBondTypeAsDouble())
    stereo = int(bond.GetStereo()) if hasattr(bond, "GetStereo") else 0
    ring = bond.IsInRing()
    return np.asarray(
        [bt == 1.0, bt == 2.0, bt == 3.0, bt == 1.5, bool(ring)]
        + _onek(stereo, [0, 1, 2, 3, 4, 5]), np.float32)


def mol2graph_dense(mols, max_atoms: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Dense padded batch graphs from RDKit mols (or SMILES).

    Replaces mpn.py:34-79's flat 1-indexed bond lists with (B, A, ...)
    tensors: fatoms (B,A,FA), fbonds (B,A,A,FB), bond_mask (B,A,A),
    atom_mask (B,A).
    """
    from hierdiff_tpu.chem import require_rdkit
    require_rdkit("MPN featurization")
    from rdkit import Chem

    mols = [Chem.MolFromSmiles(m) if isinstance(m, str) else m for m in mols]
    b = len(mols)
    a_max = max_atoms or max(m.GetNumAtoms() for m in mols)
    fatoms = np.zeros((b, a_max, ATOM_FDIM), np.float32)
    fbonds = np.zeros((b, a_max, a_max, BOND_FDIM), np.float32)
    bond_mask = np.zeros((b, a_max, a_max), np.float32)
    atom_mask = np.zeros((b, a_max), np.float32)
    for i, mol in enumerate(mols):
        na = mol.GetNumAtoms()
        atom_mask[i, :na] = 1.0
        for atom in mol.GetAtoms():
            fatoms[i, atom.GetIdx()] = atom_features(atom)
        for bond in mol.GetBonds():
            x = bond.GetBeginAtom().GetIdx()
            y = bond.GetEndAtom().GetIdx()
            f = bond_features(bond)
            fbonds[i, x, y] = f
            fbonds[i, y, x] = f
            bond_mask[i, x, y] = bond_mask[i, y, x] = 1.0
    return {"fatoms": fatoms, "fbonds": fbonds, "bond_mask": bond_mask,
            "atom_mask": atom_mask}


class MPN(nn.Module):
    """Dense masked directed-bond MPN. (reference: mpn.py:85-124)

    message m[x->y] lives at (B, A, A, H); the depth loop's neighbor sum
    excludes the reverse edge via sum_z m[z->x] - m[y->x].
    """

    hidden_size: int = 450
    depth: int = 3

    def setup(self):
        self.W_i = nn.Dense(self.hidden_size, use_bias=False,
                            kernel_init=torch_linear_init, name="W_i")
        self.W_h = nn.Dense(self.hidden_size, use_bias=False,
                            kernel_init=torch_linear_init, name="W_h")
        self.W_o = nn.Dense(self.hidden_size, kernel_init=torch_linear_init, name="W_o")

    def _messages(self, graph: Dict[str, Array],
                  seed: Optional[Array] = None) -> Array:
        fatoms, fbonds = graph["fatoms"], graph["fbonds"]
        bm = graph["bond_mask"][..., None]
        a = fatoms.shape[1]
        # fbonds row x->y concatenates the SOURCE atom features (mpn.py:56)
        binput = self.W_i(jnp.concatenate(
            [jnp.broadcast_to(fatoms[:, :, None, :],
                              fbonds.shape[:3] + (fatoms.shape[-1],)), fbonds],
            axis=-1))
        message = nn.relu(binput) * bm
        for _ in range(self.depth - 1):
            inc = jnp.sum(message, axis=1)                  # (B, A, H) into x
            if seed is not None:
                inc = inc + jnp.sum(seed, axis=1)
            # nei[x->y] = inc[x] - m[y->x]
            nei = inc[:, :, None, :] - jnp.swapaxes(message, 1, 2)
            message = nn.relu(binput + self.W_h(nei)) * bm
        return message

    def __call__(self, graph: Dict[str, Array]) -> Array:
        message = self._messages(graph)
        inc = jnp.sum(message, axis=1)
        atom_h = nn.relu(self.W_o(jnp.concatenate([graph["fatoms"], inc], axis=-1)))
        am = graph["atom_mask"][..., None]
        atom_h = atom_h * am
        return jnp.sum(atom_h, axis=1) / jnp.maximum(jnp.sum(am, axis=1), 1.0)


class JTMPN(MPN):
    """Candidate-scoring MPN seeded with junction-tree messages.
    (reference: jtmpn.py:30-139 — tree messages from the encoder enter the
    neighbor sums of bonds that cross clique boundaries.)

    ``tree_seed`` (B, A, A, H): per-atom-pair injected tree message (zero
    where none applies); the caller maps encoder edge messages onto atom
    pairs via the candidate's amap, replacing the reference's mess_dict
    bookkeeping (jtmpn.py:44-100).
    """

    def __call__(self, graph: Dict[str, Array],
                 tree_seed: Optional[Array] = None) -> Array:
        message = self._messages(graph, seed=tree_seed)
        inc = jnp.sum(message, axis=1)
        if tree_seed is not None:
            inc = inc + jnp.sum(tree_seed, axis=1)
        atom_h = nn.relu(self.W_o(jnp.concatenate([graph["fatoms"], inc], axis=-1)))
        am = graph["atom_mask"][..., None]
        atom_h = atom_h * am
        return jnp.sum(atom_h, axis=1) / jnp.maximum(jnp.sum(am, axis=1), 1.0)
