"""Deterministic fake-RDKit conformance stub.

RDKit is genuinely uninstallable in this environment (no pip network), which
left the repo's ~1,400 LoC of RDKit-gated chemistry (chem/chemutils.py,
chem/reconstruct.py, chem/mff_rmsd.py, chem/mol_tree.py MolTree-from-mol,
chem/preprocess.py, eval/metrics.py) as dead code in CI. This module is a
minimal-but-real stand-in that executes every one of those code paths with
fully deterministic fake chemistry:

- mols are explicit atom/bond lists (the HierDiff vocabulary is 100%
  kekulized — no aromatic atoms, no stereo — so no aromaticity model is
  needed; ``Kekulize`` is a checked no-op);
- a real SMILES subset parser (rings, branches, brackets with charge /
  explicit H / atom maps, bond orders) and a canonical writer built on
  iterative-refinement ranks, so SMILES-keyed dedup in ``enum_assemble``
  and uniqueness stats behave like the real thing;
- valence-aware sanitization (charge-adjusted valence tables), so
  ``sanitize()`` genuinely rejects over-valent assembly candidates;
- fake ETKDG embedding planting deterministic (crc32-seeded) coordinates
  with a short bond-spring relaxation, so Kabsch candidate scoring is
  exercised with stable orderings; ``FAIL_EMBED=True`` drives the 'max9'
  failure paths;
- substructure matching (backtracking monomorphism) for
  ``get_pos_from_cand`` / filter SMARTS / Murcko scaffolds;
- the descriptor/fingerprint surface used by eval/metrics.py.

Install with ``install()`` (registers ``rdkit.*`` in sys.modules and flips
``HAS_RDKIT`` in every loaded hierdiff_tpu module); ``uninstall()`` restores.
Process pools keep working because Linux fork inherits sys.modules.

This is a TEST HARNESS: numbers (logP, TPSA, QED, ...) are deterministic
stand-ins, not chemistry. Structural behavior (parsing, valence, rings,
matching, canonical equality) is real.
"""

from __future__ import annotations

import copy
import re
import sys
import types
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# knobs for driving failure paths in tests
FAIL_EMBED = False

# symbol -> (atomic number, mass, default valences)
_PT = {
    "H": (1, 1.008, (1,)),
    "B": (5, 10.81, (3,)),
    "C": (6, 12.011, (4,)),
    "N": (7, 14.007, (3,)),
    "O": (8, 15.999, (2,)),
    "F": (9, 18.998, (1,)),
    "P": (15, 30.974, (3, 5)),
    "S": (16, 32.06, (2, 4, 6)),
    "Cl": (17, 35.45, (1,)),
    "Br": (35, 79.904, (1,)),
    "I": (53, 126.904, (1,)),
}
_ORGANIC = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}


def _allowed_valences(symbol: str, charge: int) -> Tuple[int, ...]:
    base = _PT[symbol][2]
    if charge == 0:
        return base
    if symbol in ("C", "B"):
        return (max(base[0] - abs(charge), 0),)
    return tuple(v + charge for v in base if v + charge >= 0)


class _BondTypeMeta:
    SINGLE = 1.0
    DOUBLE = 2.0
    TRIPLE = 3.0
    AROMATIC = 1.5
    UNSPECIFIED = 0.0


BondType = _BondTypeMeta


class ChiralType:
    CHI_UNSPECIFIED = 0
    CHI_TETRAHEDRAL_CW = 1
    CHI_TETRAHEDRAL_CCW = 2


class Point3D:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = float(x), float(y), float(z)

    def __len__(self):
        return 3

    def __getitem__(self, i):
        return (self.x, self.y, self.z)[i]

    def __iter__(self):
        return iter((self.x, self.y, self.z))

    def __repr__(self):
        return f"Point3D({self.x:.3f}, {self.y:.3f}, {self.z:.3f})"


class Atom:
    def __init__(self, symbol: str):
        if symbol not in _PT:
            raise ValueError(f"unknown element {symbol!r}")
        self._symbol = symbol
        self._charge = 0
        self._explicit_hs: Optional[int] = None  # None => implicit from valence
        self._map_num = 0
        self._chiral = ChiralType.CHI_UNSPECIFIED
        self._mol: Optional["Mol"] = None
        self._idx: Optional[int] = None

    # identity / bookkeeping
    def GetSymbol(self):
        return self._symbol

    def GetAtomicNum(self):
        return _PT[self._symbol][0]

    def GetMass(self):
        return _PT[self._symbol][1]

    def GetIdx(self):
        return self._idx

    def GetFormalCharge(self):
        return self._charge

    def SetFormalCharge(self, c):
        self._charge = int(c)

    def GetAtomMapNum(self):
        return self._map_num

    def SetAtomMapNum(self, n):
        self._map_num = int(n)

    def GetChiralTag(self):
        return self._chiral

    def SetChiralTag(self, t):
        self._chiral = int(t)

    def SetNumExplicitHs(self, n):
        self._explicit_hs = int(n)

    def SetNoImplicit(self, flag):
        if flag and self._explicit_hs is None:
            self._explicit_hs = 0

    def GetIsAromatic(self):
        return False  # the HierDiff vocabulary is fully kekulized

    # graph queries (need the owning mol)
    def _bond_order_sum(self) -> float:
        return sum(b.GetBondTypeAsDouble() for b in self.GetBonds())

    def GetBonds(self):
        if self._mol is None:
            return []
        return [b for b in self._mol._bonds
                if self._idx in (b._a1, b._a2)]

    def GetDegree(self):
        return len(self.GetBonds())

    def GetNeighbors(self):
        out = []
        for b in self.GetBonds():
            j = b._a2 if b._a1 == self._idx else b._a1
            out.append(self._mol._atoms[j])
        return out

    def GetTotalNumHs(self, includeNeighbors=False):
        if self._explicit_hs is not None:
            n = self._explicit_hs
        else:
            n = self.GetNumImplicitHs()
        if includeNeighbors:
            n += sum(1 for a in self.GetNeighbors() if a.GetSymbol() == "H")
        return n

    def GetNumImplicitHs(self):
        if self._explicit_hs is not None:
            return 0
        bsum = self._bond_order_sum()
        for v in _allowed_valences(self._symbol, self._charge):
            if v >= bsum - 1e-9:
                return int(round(v - bsum))
        return 0  # over-valent; sanitization catches this

    def IsInRing(self):
        if self._mol is None:
            return False
        return any(self._idx in r for r in self._mol._sssr())

    def valence_ok(self) -> bool:
        bsum = self._bond_order_sum()
        allowed = _allowed_valences(self._symbol, self._charge)
        if not allowed:
            return False
        if self._explicit_hs is not None:
            return bsum + self._explicit_hs <= max(allowed) + 1e-9
        return any(v >= bsum - 1e-9 for v in allowed)


class Bond:
    def __init__(self, mol, idx, a1, a2, order):
        self._mol, self._idx, self._a1, self._a2 = mol, idx, a1, a2
        self._order = float(order)

    def GetIdx(self):
        return self._idx

    def GetBeginAtom(self):
        return self._mol._atoms[self._a1]

    def GetEndAtom(self):
        return self._mol._atoms[self._a2]

    def GetBeginAtomIdx(self):
        return self._a1

    def GetEndAtomIdx(self):
        return self._a2

    def GetBondType(self):
        return self._order

    def SetBondType(self, t):
        self._order = float(t)

    def GetBondTypeAsDouble(self):
        return self._order

    def IsInRing(self):
        e = frozenset((self._a1, self._a2))
        return e in self._mol._ring_edges()

    def GetStereo(self):
        return 0  # no stereo model (vocabulary carries none)


class Conformer:
    def __init__(self, num_atoms=0, positions=None):
        if positions is not None:
            self._pos = np.asarray(positions, float).copy()
        else:
            self._pos = np.zeros((num_atoms, 3))
        self._id = 0

    def GetAtomPosition(self, i):
        return Point3D(*self._pos[int(i)])

    def SetAtomPosition(self, i, p):
        self._pos[int(i)] = np.asarray(tuple(p), float)

    def GetNumAtoms(self):
        return len(self._pos)

    def GetPositions(self):
        return self._pos.copy()

    def GetId(self):
        return self._id


class _RingInfo:
    def __init__(self, rings: List[Tuple[int, ...]]):
        self._rings = rings

    def NumRings(self):
        return len(self._rings)

    def AtomRings(self):
        return tuple(tuple(r) for r in self._rings)


class Mol:
    def __init__(self):
        self._atoms: List[Atom] = []
        self._bonds: List[Bond] = []
        self._confs: List[Conformer] = []
        self._ring_cache = None

    # --- construction helpers (internal) ---
    def _add_atom(self, atom: Atom) -> int:
        atom._mol = self
        atom._idx = len(self._atoms)
        self._atoms.append(atom)
        self._ring_cache = None
        return atom._idx

    def _add_bond(self, i, j, order) -> Bond:
        if i == j:
            raise ValueError("self bond")
        if self.GetBondBetweenAtoms(i, j) is not None:
            raise ValueError("duplicate bond")
        b = Bond(self, len(self._bonds), int(i), int(j), order)
        self._bonds.append(b)
        self._ring_cache = None
        return b

    # --- RDKit API ---
    def GetAtoms(self):
        return list(self._atoms)

    def GetBonds(self):
        return list(self._bonds)

    def GetNumAtoms(self):
        return len(self._atoms)

    def GetNumBonds(self):
        return len(self._bonds)

    def GetNumHeavyAtoms(self):
        return sum(1 for a in self._atoms if a.GetSymbol() != "H")

    def GetAtomWithIdx(self, i):
        return self._atoms[int(i)]

    def GetBondWithIdx(self, i):
        return self._bonds[int(i)]

    def GetBondBetweenAtoms(self, i, j):
        e = {int(i), int(j)}
        for b in self._bonds:
            if {b._a1, b._a2} == e:
                return b
        return None

    def GetConformer(self, cid=0):
        if not self._confs:
            raise ValueError("no conformers")
        return self._confs[int(cid)]

    def GetNumConformers(self):
        return len(self._confs)

    def GetConformers(self):
        return list(self._confs)

    def AddConformer(self, conf, assignId=False):
        c = Conformer(positions=conf.GetPositions())
        c._id = len(self._confs)
        self._confs.append(c)
        return c._id

    def RemoveAllConformers(self):
        self._confs = []

    def GetRingInfo(self):
        return _RingInfo(self._sssr())

    def GetMol(self):
        # Mol is already immutable-enough; return a deep copy like RDKit
        return copy.deepcopy(self)

    # --- ring perception (SSSR-ish: shortest independent cycles) ---
    def _adj(self) -> List[List[int]]:
        adj: List[List[int]] = [[] for _ in self._atoms]
        for b in self._bonds:
            adj[b._a1].append(b._a2)
            adj[b._a2].append(b._a1)
        return adj

    def _sssr(self) -> List[Tuple[int, ...]]:
        if self._ring_cache is not None:
            return self._ring_cache
        n = len(self._atoms)
        adj = self._adj()
        # spanning forest -> fundamental count = E - V + components
        parent = [-1] * n
        seen = [False] * n
        tree_edges = set()
        comps = 0
        for root in range(n):
            if seen[root]:
                continue
            comps += 1
            stack = [root]
            seen[root] = True
            while stack:
                u = stack.pop()
                for v in adj[u]:
                    if not seen[v]:
                        seen[v] = True
                        parent[v] = u
                        tree_edges.add(frozenset((u, v)))
                        stack.append(v)
        rank_needed = len(self._bonds) - n + comps
        if rank_needed <= 0:
            self._ring_cache = []
            return []
        # for every non-tree edge, shortest cycle through it (BFS avoiding it)
        cycles: List[Tuple[int, ...]] = []
        for b in self._bonds:
            e = frozenset((b._a1, b._a2))
            if e in tree_edges:
                continue
            path = self._shortest_path(b._a1, b._a2, forbid=e, adj=adj)
            if path is not None:
                cycles.append(tuple(path))
        # GF(2)-independent subset, shortest first (edge-incidence vectors
        # reduced against pivoted basis rows)
        cycles.sort(key=len)
        basis: List[Tuple[frozenset, set]] = []  # (pivot edge, reduced vector)
        out: List[Tuple[int, ...]] = []
        for cyc in cycles:
            vec = {frozenset((cyc[i], cyc[(i + 1) % len(cyc)]))
                   for i in range(len(cyc))}
            for pivot, bvec in basis:
                if pivot in vec:
                    vec = vec ^ bvec
            if vec:
                basis.append((next(iter(vec)), vec))
                out.append(cyc)
            if len(out) == rank_needed:
                break
        self._ring_cache = out
        return out

    def _shortest_path(self, src, dst, forbid, adj):
        from collections import deque
        prev = {src: None}
        q = deque([src])
        while q:
            u = q.popleft()
            if u == dst:
                path = []
                while u is not None:
                    path.append(u)
                    u = prev[u]
                return path
            for v in adj[u]:
                if frozenset((u, v)) == forbid or v in prev:
                    continue
                prev[v] = u
                q.append(v)
        return None

    def _ring_edges(self) -> set:
        edges = set()
        for r in self._sssr():
            for i in range(len(r)):
                edges.add(frozenset((r[i], r[(i + 1) % len(r)])))
        return edges

    # --- substructure matching (monomorphism; symbol+charge, bond order) ---
    def GetSubstructMatches(self, query: "Mol", uniquify=True, maxMatches=1000):
        if query.GetNumAtoms() == 0:
            return ()
        qadj: Dict[int, Dict[int, float]] = {i: {} for i in range(query.GetNumAtoms())}
        for b in query._bonds:
            qadj[b._a1][b._a2] = b._order
            qadj[b._a2][b._a1] = b._order
        tadj: Dict[int, Dict[int, float]] = {i: {} for i in range(self.GetNumAtoms())}
        for b in self._bonds:
            tadj[b._a1][b._a2] = b._order
            tadj[b._a2][b._a1] = b._order
        qa, ta = query._atoms, self._atoms

        # order query atoms so each (after the first) touches a mapped one
        order = []
        placed = set()
        for start in range(len(qa)):
            if start in placed:
                continue
            stack = [start]
            placed.add(start)
            while stack:
                u = stack.pop()
                order.append(u)
                for v in qadj[u]:
                    if v not in placed:
                        placed.add(v)
                        stack.append(v)

        matches: List[Tuple[int, ...]] = []
        seen_sets = set()
        mapping: Dict[int, int] = {}
        used = set()

        def compatible(qi, ti):
            a, b = qa[qi], ta[ti]
            if a.GetSymbol() != b.GetSymbol() or a.GetFormalCharge() != b.GetFormalCharge():
                return False
            for qn, qorder in qadj[qi].items():
                if qn in mapping:
                    tn = mapping[qn]
                    if tn not in tadj[ti] or abs(tadj[ti][tn] - qorder) > 1e-9:
                        return False
            return True

        def backtrack(k):
            if len(matches) >= maxMatches:
                return
            if k == len(order):
                m = tuple(mapping[i] for i in range(len(qa)))
                if uniquify:
                    key = frozenset(m)
                    if key in seen_sets:
                        return
                    seen_sets.add(key)
                matches.append(m)
                return
            qi = order[k]
            anchored = [qn for qn in qadj[qi] if qn in mapping]
            cands = (tadj[mapping[anchored[0]]].keys() if anchored
                     else range(len(ta)))
            for ti in cands:
                if ti in used:
                    continue
                if compatible(qi, ti):
                    mapping[qi] = ti
                    used.add(ti)
                    backtrack(k + 1)
                    del mapping[qi]
                    used.discard(ti)

        backtrack(0)
        return tuple(matches)

    def HasSubstructMatch(self, query):
        return len(self.GetSubstructMatches(query, maxMatches=1)) > 0

    def __deepcopy__(self, memo):
        new = self.__class__.__new__(self.__class__)
        new._atoms, new._bonds, new._confs = [], [], []
        new._ring_cache = None
        memo[id(self)] = new
        for a in self._atoms:
            na = Atom(a._symbol)
            na._charge, na._explicit_hs = a._charge, a._explicit_hs
            na._map_num, na._chiral = a._map_num, a._chiral
            new._add_atom(na)
        for b in self._bonds:
            new._add_bond(b._a1, b._a2, b._order)
        for c in self._confs:
            new.AddConformer(c)
        return new


class RWMol(Mol):
    def __init__(self, mol: Optional[Mol] = None):
        super().__init__()
        if mol is not None:
            cp = copy.deepcopy(mol)
            self._atoms, self._bonds, self._confs = cp._atoms, cp._bonds, cp._confs
            for a in self._atoms:
                a._mol = self
            for b in self._bonds:
                b._mol = self

    def AddAtom(self, atom: Atom) -> int:
        na = Atom(atom._symbol)
        na._charge, na._explicit_hs = atom._charge, atom._explicit_hs
        na._map_num, na._chiral = atom._map_num, atom._chiral
        return self._add_atom(na)

    def AddBond(self, i, j, order=BondType.SINGLE) -> int:
        self._add_bond(i, j, order)
        return len(self._bonds)

    def RemoveBond(self, i, j):
        e = {int(i), int(j)}
        self._bonds = [b for b in self._bonds if {b._a1, b._a2} != e]
        for k, b in enumerate(self._bonds):
            b._idx = k
        self._ring_cache = None

    def RemoveAtom(self, idx):
        idx = int(idx)
        self._bonds = [b for b in self._bonds if idx not in (b._a1, b._a2)]
        del self._atoms[idx]
        for k, a in enumerate(self._atoms):
            a._idx = k
        for b in self._bonds:
            if b._a1 > idx:
                b._a1 -= 1
            if b._a2 > idx:
                b._a2 -= 1
        for k, b in enumerate(self._bonds):
            b._idx = k
        if self._confs:
            for c in self._confs:
                c._pos = np.delete(c._pos, idx, axis=0)
        self._ring_cache = None


# --------------------------------------------------------------------------
# SMILES parser
# --------------------------------------------------------------------------

_BOND_CHARS = {"-": 1.0, "=": 2.0, "#": 3.0, ":": 1.5, "/": 1.0, "\\": 1.0}


def _parse_smiles(s: str) -> Mol:
    mol = Mol()
    prev: Optional[int] = None
    stack: List[Optional[int]] = []
    pending: Optional[float] = None
    ring_open: Dict[str, Tuple[int, Optional[float]]] = {}

    def attach(idx):
        nonlocal prev, pending
        if prev is not None:
            mol._add_bond(prev, idx, pending if pending is not None else 1.0)
        prev = idx
        pending = None

    def close_ring(label):
        nonlocal pending
        if label in ring_open:
            other, other_order = ring_open.pop(label)
            order = pending if pending is not None else (
                other_order if other_order is not None else 1.0)
            mol._add_bond(other, prev, order)
        else:
            ring_open[label] = (prev, pending)
        pending = None

    i = 0
    while i < len(s):
        c = s[i]
        if c == "(":
            stack.append(prev)
            i += 1
        elif c == ")":
            prev = stack.pop()
            i += 1
        elif c in _BOND_CHARS:
            pending = _BOND_CHARS[c]
            i += 1
        elif c == ".":
            prev = None
            pending = None
            i += 1
        elif c == "%":
            close_ring(s[i + 1: i + 3])
            i += 3
        elif c.isdigit():
            close_ring(c)
            i += 1
        elif c == "[":
            j = s.index("]", i)
            body = s[i + 1: j]
            m = re.match(
                r"^(?P<iso>\d+)?(?P<sym>[A-Z][a-z]?|[a-z])(?P<chiral>@{1,2})?"
                r"(?P<hs>H\d*)?(?P<chg>[+-]+\d*|\+\d+|-\d+)?(?::(?P<map>\d+))?$",
                body)
            if m is None:
                raise ValueError(f"cannot parse bracket atom [{body}]")
            sym = m.group("sym")
            if sym not in _PT:
                raise ValueError(f"unknown element {sym!r}")
            atom = Atom(sym)
            hs = m.group("hs")
            atom._explicit_hs = (1 if hs == "H" else int(hs[1:])) if hs else 0
            chg = m.group("chg")
            if chg:
                if chg[-1].isdigit():
                    num = int(re.sub(r"[+-]", "", chg))
                    atom._charge = num if "+" in chg else -num
                else:
                    atom._charge = chg.count("+") - chg.count("-")
            if m.group("map"):
                atom._map_num = int(m.group("map"))
            attach(mol._add_atom(atom))
            i = j + 1
        else:
            sym = s[i: i + 2] if s[i: i + 2] in ("Cl", "Br") else c
            if sym not in _ORGANIC:
                raise ValueError(f"cannot parse SMILES atom at {s[i:]!r}")
            attach(mol._add_atom(Atom(sym)))
            i += len(sym)
    if ring_open:
        raise ValueError(f"unclosed ring bonds in {s!r}")
    return mol


def MolFromSmiles(smiles: str, sanitize: bool = True) -> Optional[Mol]:
    if smiles is None:
        return None
    try:
        mol = _parse_smiles(smiles.strip())
    except Exception:
        return None
    if sanitize and not all(a.valence_ok() for a in mol._atoms):
        return None
    return mol


def SanitizeMol(mol):
    if not all(a.valence_ok() for a in mol._atoms):
        raise ValueError("sanitization failed: valence error")
    return 0


def MolFromSmarts(sma: str) -> Optional[Mol]:
    # SMARTS-lite: plain-SMILES patterns only (enough for filter tables)
    return MolFromSmiles(sma, sanitize=False)


# --------------------------------------------------------------------------
# canonical SMILES writer
# --------------------------------------------------------------------------


def _canon_ranks(mol: Mol, atoms: Optional[Sequence[int]] = None) -> Dict[int, int]:
    idxs = list(range(mol.GetNumAtoms())) if atoms is None else list(atoms)
    aset = set(idxs)
    adj: Dict[int, List[Tuple[int, float]]] = {i: [] for i in idxs}
    for b in mol._bonds:
        if b._a1 in aset and b._a2 in aset:
            adj[b._a1].append((b._a2, b._order))
            adj[b._a2].append((b._a1, b._order))

    def initial(i):
        a = mol._atoms[i]
        return (a.GetSymbol(), a.GetFormalCharge(), a.GetTotalNumHs(),
                a.GetAtomMapNum(), len(adj[i]),
                tuple(sorted(o for _, o in adj[i])))

    ranks = {i: r for r, key in
             enumerate(sorted({initial(i) for i in idxs}))
             for i in idxs if initial(i) == key}

    def refine(ranks):
        while True:
            keys = {i: (ranks[i], tuple(sorted((ranks[j], o) for j, o in adj[i])))
                    for i in idxs}
            uniq = sorted(set(keys.values()))
            new = {i: uniq.index(keys[i]) for i in idxs}
            if new == ranks:
                return ranks
            ranks = new

    ranks = refine(ranks)
    # break symmetry classes deterministically
    while len(set(ranks.values())) < len(idxs):
        counts: Dict[int, List[int]] = {}
        for i in idxs:
            counts.setdefault(ranks[i], []).append(i)
        tied_rank = min(r for r, members in counts.items() if len(members) > 1)
        chosen = min(counts[tied_rank])
        ranks = {i: (r * 2 if i != chosen else r * 2 - 1)
                 for i, r in ranks.items()}
        uniq = sorted(set(ranks.values()))
        ranks = {i: uniq.index(r) for i, r in ranks.items()}
        ranks = refine(ranks)
    return ranks


def _default_hs(a: Atom) -> int:
    """Implicit H count the parser would assign to a bare (bracket-free) atom."""
    bsum = a._bond_order_sum()
    for v in _allowed_valences(a._symbol, a._charge):
        if v >= bsum - 1e-9:
            return int(round(v - bsum))
    return -1


def _atom_token(a: Atom) -> str:
    # brackets only when needed: explicit H counts that just restate the
    # default valence are dropped, like RDKit's canonical writer
    redundant_hs = (a._explicit_hs is not None
                    and a._explicit_hs == _default_hs(a))
    needs_bracket = (a.GetFormalCharge() != 0
                     or (a._explicit_hs is not None and not redundant_hs)
                     or a.GetAtomMapNum() != 0 or a.GetSymbol() not in _ORGANIC)
    if not needs_bracket:
        return a.GetSymbol()
    h = a.GetTotalNumHs()
    hstr = "" if h == 0 else ("H" if h == 1 else f"H{h}")
    c = a.GetFormalCharge()
    cstr = "" if c == 0 else ("+" if c == 1 else "-" if c == -1
                              else (f"+{c}" if c > 0 else f"-{-c}"))
    mstr = f":{a.GetAtomMapNum()}" if a.GetAtomMapNum() else ""
    return f"[{a.GetSymbol()}{hstr}{cstr}{mstr}]"


def _bond_token(order: float) -> str:
    if abs(order - 2.0) < 1e-9:
        return "="
    if abs(order - 3.0) < 1e-9:
        return "#"
    return ""


def _write_component(mol: Mol, comp: List[int], ranks: Dict[int, int]) -> str:
    adj: Dict[int, List[Tuple[int, float]]] = {i: [] for i in comp}
    cset = set(comp)
    for b in mol._bonds:
        if b._a1 in cset and b._a2 in cset:
            adj[b._a1].append((b._a2, b._order))
            adj[b._a2].append((b._a1, b._order))

    start = min(comp, key=lambda i: ranks[i])
    visited = set()
    ring_bonds: Dict[frozenset, str] = {}
    ring_digit = [0]

    # first pass: find back edges via DFS (deterministic by rank)
    parent: Dict[int, Optional[int]] = {start: None}
    order_stack = [start]
    visited.add(start)
    back_edges = []
    dfs_order = []
    while order_stack:
        u = order_stack.pop()
        dfs_order.append(u)
        for v, _ in sorted(adj[u], key=lambda t: ranks[t[0]], reverse=True):
            if v not in visited:
                visited.add(v)
                parent[v] = u
                order_stack.append(v)
            elif parent.get(u) != v:
                e = frozenset((u, v))
                if e not in ring_bonds:
                    ring_digit[0] += 1
                    d = ring_digit[0]
                    ring_bonds[e] = str(d) if d < 10 else f"%{d}"

    out: List[str] = []
    visited = set()

    def emit(u, bond_from_parent: str):
        visited.add(u)
        out.append(bond_from_parent)
        out.append(_atom_token(mol._atoms[u]))
        # ring-closure digits on this atom
        for v, o in sorted(adj[u], key=lambda t: ranks[t[0]]):
            e = frozenset((u, v))
            if e in ring_bonds:
                tok = ring_bonds[e]
                if v in visited and not tok.endswith("*"):
                    out.append(tok)
                    ring_bonds[e] = tok + "*"
                elif v not in visited:
                    out.append(_bond_token(o) + tok)
        children = [(v, o) for v, o in adj[u]
                    if v not in visited and frozenset((u, v)) not in ring_bonds]
        children.sort(key=lambda t: ranks[t[0]])
        for k, (v, o) in enumerate(children):
            if v in visited:
                continue
            if k < len(children) - 1:
                out.append("(")
                emit(v, _bond_token(o))
                out.append(")")
            else:
                emit(v, _bond_token(o))

    emit(start, "")
    return "".join(out)


def MolToSmiles(mol: Mol, kekuleSmiles: bool = False, isomericSmiles: bool = True,
                canonical: bool = True, **kw) -> str:
    if mol.GetNumAtoms() == 0:
        return ""
    ranks = _canon_ranks(mol)
    comps = _components(mol)
    parts = sorted(_write_component(mol, comp, ranks) for comp in comps)
    return ".".join(parts)


def _components(mol: Mol) -> List[List[int]]:
    adj = mol._adj()
    seen = set()
    comps = []
    for i in range(mol.GetNumAtoms()):
        if i in seen:
            continue
        comp = []
        stack = [i]
        seen.add(i)
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        comps.append(comp)
    return comps


def MolFragmentToSmiles(mol: Mol, atomsToUse: Sequence[int],
                        kekuleSmiles: bool = False, **kw) -> str:
    sub = Mol()
    remap = {}
    for i in atomsToUse:
        a = mol._atoms[int(i)]
        na = Atom(a._symbol)
        na._charge, na._map_num, na._chiral = a._charge, a._map_num, a._chiral
        # H counts become explicit on fragment boundaries in RDKit; keep
        # implicit here so fragments re-parse with free valence
        remap[int(i)] = sub._add_atom(na)
    for b in mol._bonds:
        if b._a1 in remap and b._a2 in remap:
            sub._add_bond(remap[b._a1], remap[b._a2], b._order)
    return MolToSmiles(sub, kekuleSmiles=kekuleSmiles)


def Kekulize(mol, clearAromaticFlags=False):
    # the HierDiff vocabulary is already kekulized; assert no aromatic bonds
    for b in mol._bonds:
        if abs(b._order - 1.5) < 1e-9:
            raise ValueError("fake rdkit cannot kekulize aromatic bonds")
    return mol


# --------------------------------------------------------------------------
# H add / remove
# --------------------------------------------------------------------------


def AddHs(mol: Mol) -> Mol:
    new = copy.deepcopy(mol)
    n0 = new.GetNumAtoms()
    pos = new._confs[0]._pos.copy() if new._confs else None
    extra = []
    for i in range(n0):
        a = new._atoms[i]
        if a.GetSymbol() == "H":
            continue
        k = a.GetTotalNumHs()
        a._explicit_hs = 0
        for hh in range(k):
            h = Atom("H")
            h._explicit_hs = 0
            hi = new._add_atom(h)
            new._add_bond(i, hi, 1.0)
            if pos is not None:
                rng = np.random.default_rng(zlib.crc32(f"{i}:{hh}".encode()))
                extra.append(pos[i] + rng.normal(size=3) * 0.35)
    if pos is not None:
        new._confs = [Conformer(positions=np.concatenate(
            [pos, np.asarray(extra).reshape(-1, 3)], axis=0))]
    return new


def RemoveHs(mol: Mol) -> Mol:
    new = RWMol(mol)
    h_idx = [a.GetIdx() for a in new._atoms if a.GetSymbol() == "H"]
    for idx in reversed(h_idx):
        for nb in new._atoms[idx].GetNeighbors():
            if nb._explicit_hs is not None:
                nb._explicit_hs += 1
        new.RemoveAtom(idx)
    out = Mol()
    out._atoms, out._bonds, out._confs = new._atoms, new._bonds, new._confs
    for a in out._atoms:
        a._mol = out
    for b in out._bonds:
        b._mol = out
    return out


# --------------------------------------------------------------------------
# embedding (fake ETKDG) + force fields
# --------------------------------------------------------------------------


def _embed_positions(mol: Mol, seed: int) -> np.ndarray:
    n = mol.GetNumAtoms()
    rng = np.random.default_rng(seed & 0xFFFFFFFF)
    pos = rng.normal(size=(n, 3)) * (0.6 * max(n, 2) ** (1.0 / 3.0))
    bonds = [(b._a1, b._a2) for b in mol._bonds]
    # short deterministic spring relaxation: bonded ~1.5A, everyone repels
    for _ in range(40):
        for i, j in bonds:
            d = pos[j] - pos[i]
            dist = np.linalg.norm(d) + 1e-9
            corr = 0.4 * (dist - 1.5) * d / dist
            pos[i] += corr
            pos[j] -= corr
    return pos


def ETKDG():
    return types.SimpleNamespace(name="ETKDG")


def ETKDGv3():
    return types.SimpleNamespace(name="ETKDGv3")


def EmbedMolecule(mol: Mol, params=None, randomSeed: int = -1, **kw) -> int:
    if FAIL_EMBED:
        return -1
    if isinstance(params, int):
        randomSeed = params
    seed = zlib.crc32(MolToSmiles(mol).encode())
    if randomSeed not in (-1, None):
        seed ^= int(randomSeed)
    mol._confs = [Conformer(positions=_embed_positions(mol, seed))]
    return 0


def EmbedMultipleConfs(mol: Mol, numConfs: int = 10, numThreads: int = 1, **kw):
    if FAIL_EMBED:
        return []
    base = zlib.crc32(MolToSmiles(mol).encode())
    mol._confs = []
    for k in range(numConfs):
        c = Conformer(positions=_embed_positions(mol, base + k + 1))
        c._id = k
        mol._confs.append(c)
    return list(range(numConfs))


def MMFFOptimizeMolecule(mol, **kw) -> int:
    if mol.GetNumConformers() == 0:
        raise ValueError("no conformer to optimize")
    return 0


def MMFFOptimizeMoleculeConfs(mol, numThreads: int = 1, **kw):
    return [(0, 0.0)] * max(mol.GetNumConformers(), 1)


def UFFOptimizeMoleculeConfs(mol, maxIters: int = 200, **kw):
    if mol.GetNumConformers() == 0:
        raise ValueError("no conformer to optimize")
    # deterministic tiny drift so base_rmsd measures something nonzero
    for c in mol._confs:
        rng = np.random.default_rng(zlib.crc32(c._pos.tobytes()))
        c._pos = c._pos + rng.normal(size=c._pos.shape) * 0.02
    return [(0, 0.0)] * mol.GetNumConformers()


def GetConformerRMS(mol, confId1, confId2, prealigned=False, **kw) -> float:
    p1 = mol._confs[int(confId1)]._pos
    p2 = mol._confs[int(confId2)]._pos
    return float(np.sqrt(np.mean(np.sum((p1 - p2) ** 2, axis=1))))


def GetMorganFingerprintAsBitVect(mol: Mol, radius: int = 2, nBits: int = 2048):
    adj = mol._adj()
    inv = [zlib.crc32(f"{a.GetSymbol()}|{a.GetFormalCharge()}|{a.GetTotalNumHs()}"
                      .encode()) for a in mol._atoms]
    bits = np.zeros(nBits, dtype=np.uint8)
    for _ in range(radius + 1):
        for h in inv:
            bits[h % nBits] = 1
        inv = [zlib.crc32(str((inv[i], tuple(sorted(inv[j] for j in adj[i]))))
                          .encode()) for i in range(len(inv))]
    return bits


# --------------------------------------------------------------------------
# descriptors
# --------------------------------------------------------------------------


def _heavy(mol):
    return [a for a in mol._atoms if a.GetSymbol() != "H"]


def ExactMolWt(mol) -> float:
    w = sum(a.GetMass() for a in mol._atoms)
    w += sum(a.GetTotalNumHs() * _PT["H"][1] for a in mol._atoms)
    return float(w)


_LOGP = {"C": 0.32, "F": 0.4, "Cl": 0.65, "Br": 0.85, "I": 1.1,
         "N": -0.25, "O": -0.35, "S": 0.12, "P": -0.1, "B": 0.1, "H": 0.0}


def MolLogP(mol) -> float:
    v = sum(_LOGP[a.GetSymbol()] for a in mol._atoms)
    v -= 0.12 * sum(a.GetTotalNumHs() for a in mol._atoms
                    if a.GetSymbol() in ("N", "O"))
    return float(v)


def NumRotatableBonds(mol) -> int:
    n = 0
    for b in mol._bonds:
        if abs(b._order - 1.0) > 1e-9 or b.IsInRing():
            continue
        a1, a2 = b.GetBeginAtom(), b.GetEndAtom()
        if a1.GetSymbol() == "H" or a2.GetSymbol() == "H":
            continue
        if a1.GetDegree() >= 2 and a2.GetDegree() >= 2:
            n += 1
    return n


def NumHeteroatoms(mol) -> int:
    return sum(1 for a in _heavy(mol) if a.GetSymbol() != "C")


def NumHAcceptors(mol) -> int:
    return sum(1 for a in mol._atoms if a.GetSymbol() in ("N", "O"))


def NumHDonors(mol) -> int:
    return sum(1 for a in mol._atoms
               if a.GetSymbol() in ("N", "O", "S") and a.GetTotalNumHs() > 0)


def _CalcTPSAContribs(mol) -> tuple:
    out = []
    for a in mol._atoms:
        if a.GetSymbol() == "N":
            out.append(3.24 + 2.0 * a.GetTotalNumHs())
        elif a.GetSymbol() == "O":
            out.append(9.23 + 2.0 * a.GetTotalNumHs())
        elif a.GetSymbol() == "S":
            out.append(1.5)
        else:
            out.append(0.0)
    return tuple(out)


def _CalcLabuteASAContribs(mol):
    per_atom = [a.GetMass() / 3.0 + 1.2 * a.GetTotalNumHs() for a in mol._atoms]
    return (per_atom, 1.0)


# --------------------------------------------------------------------------
# scaffolds / QED / MCS / stereo
# --------------------------------------------------------------------------


def GetScaffoldForMol(mol: Mol) -> Mol:
    work = RWMol(mol)
    while True:
        ring_atoms = set()
        for r in work._sssr():
            ring_atoms.update(r)
        victims = [a.GetIdx() for a in work._atoms
                   if a.GetDegree() <= 1 and a.GetIdx() not in ring_atoms]
        if not victims:
            break
        for idx in reversed(sorted(victims)):
            work.RemoveAtom(idx)
    out = Mol()
    out._atoms, out._bonds = work._atoms, work._bonds
    for a in out._atoms:
        a._mol = out
    for b in out._bonds:
        b._mol = out
    return out


def qed(mol) -> float:
    mw = ExactMolWt(mol)
    logp = MolLogP(mol)
    v = 1.0 / (1.0 + np.exp((mw - 400.0) / 120.0))
    v *= 1.0 / (1.0 + np.exp((abs(logp - 2.0) - 3.0) / 1.5))
    return float(np.clip(v, 0.0, 1.0))


class _MCSResult:
    def __init__(self, num_atoms, num_bonds):
        self.numAtoms = num_atoms
        self.numBonds = num_bonds
        self.canceled = False
        self.smartsString = ""


def FindMCS(mols, **kw) -> _MCSResult:
    from collections import Counter
    counts = [Counter((a.GetSymbol(), a.GetFormalCharge()) for a in m._atoms)
              for m in mols]
    common = counts[0]
    for c in counts[1:]:
        common = common & c
    return _MCSResult(sum(common.values()), max(sum(common.values()) - 1, 0))


def EnumerateStereoisomers(mol, options=None):
    yield copy.deepcopy(mol)


# --------------------------------------------------------------------------
# SDF I/O (V2000)
# --------------------------------------------------------------------------


def MolToMolBlock(mol: Mol, confId: int = 0) -> str:
    n, m = mol.GetNumAtoms(), mol.GetNumBonds()
    pos = (mol._confs[confId]._pos if mol._confs
           else np.zeros((n, 3)))
    lines = ["", "  fake-rdkit", "",
             f"{n:3d}{m:3d}  0  0  0  0  0  0  0  0999 V2000"]
    for i, a in enumerate(mol._atoms):
        x, y, z = pos[i]
        lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {a.GetSymbol():<3s}"
                     " 0  0  0  0  0  0  0  0  0  0  0  0")
    for b in mol._bonds:
        lines.append(f"{b._a1 + 1:3d}{b._a2 + 1:3d}{int(round(b._order)):3d}  0")
    chg = [(i + 1, a.GetFormalCharge()) for i, a in enumerate(mol._atoms)
           if a.GetFormalCharge() != 0]
    if chg:
        entries = "".join(f" {i:3d} {c:3d}" for i, c in chg)
        lines.append(f"M  CHG{len(chg):3d}{entries}")
    lines.append("M  END")
    return "\n".join(lines) + "\n"


def _mol_from_molblock(block: str) -> Optional[Mol]:
    try:
        lines = block.split("\n")
        # locate the counts line by its V2000 tag (leading blank/title lines
        # vary with how the $$$$-separated block was sliced)
        ci = next(i for i, ln in enumerate(lines) if "V2000" in ln)
        counts = lines[ci]
        n, m = int(counts[0:3]), int(counts[3:6])
        mol = Mol()
        pos = np.zeros((n, 3))
        for i in range(n):
            ln = lines[ci + 1 + i]
            pos[i] = [float(ln[0:10]), float(ln[10:20]), float(ln[20:30])]
            sym = ln[31:34].strip()
            a = Atom(sym)
            mol._add_atom(a)
        for k in range(m):
            ln = lines[ci + 1 + n + k]
            mol._add_bond(int(ln[0:3]) - 1, int(ln[3:6]) - 1, float(int(ln[6:9])))
        for ln in lines[ci + 1 + n + m:]:
            if ln.startswith("M  CHG"):
                cnt = int(ln[6:9])
                vals = ln[9:].split()
                for c in range(cnt):
                    mol._atoms[int(vals[2 * c]) - 1]._charge = int(vals[2 * c + 1])
            if ln.startswith("M  END"):
                break
        mol._confs = [Conformer(positions=pos)]
        if not all(a.valence_ok() for a in mol._atoms):
            return None
        return mol
    except Exception:
        return None


class SDMolSupplier:
    def __init__(self, path: str, sanitize: bool = True, removeHs: bool = True):
        with open(path) as f:
            text = f.read()
        self._blocks = [b for b in text.split("$$$$") if b.strip()]

    def __iter__(self):
        for b in self._blocks:
            yield _mol_from_molblock(b)

    def __len__(self):
        return len(self._blocks)


# --------------------------------------------------------------------------
# sys.modules wiring
# --------------------------------------------------------------------------

_SAVED_MODULES: Optional[Dict[str, Optional[types.ModuleType]]] = None
_FLIPPED: List[types.ModuleType] = []


def _mod(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _build_modules() -> Dict[str, types.ModuleType]:
    import os

    this = sys.modules[__name__]
    contrib = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fake_rdkit_contrib")

    chem_attrs = dict(
        Mol=Mol, RWMol=RWMol, Atom=Atom, Bond=Bond, BondType=BondType,
        Conformer=Conformer,
        MolFromSmiles=MolFromSmiles, MolToSmiles=MolToSmiles,
        MolFragmentToSmiles=MolFragmentToSmiles, MolFromSmarts=MolFromSmarts,
        Kekulize=Kekulize, SanitizeMol=SanitizeMol,
        AddHs=AddHs, RemoveHs=RemoveHs,
        GetSymmSSSR=lambda mol: [list(r) for r in mol._sssr()],
        MolToMolBlock=MolToMolBlock, SDMolSupplier=SDMolSupplier,
        rdchem=types.SimpleNamespace(ChiralType=ChiralType, Mol=Mol,
                                     RWMol=RWMol, BondType=BondType),
        RDConfig=types.SimpleNamespace(RDContribDir=contrib),
    )
    allchem_attrs = dict(
        ETKDG=ETKDG, ETKDGv3=ETKDGv3, EmbedMolecule=EmbedMolecule,
        EmbedMultipleConfs=EmbedMultipleConfs,
        MMFFOptimizeMolecule=MMFFOptimizeMolecule,
        MMFFOptimizeMoleculeConfs=MMFFOptimizeMoleculeConfs,
        UFFOptimizeMoleculeConfs=UFFOptimizeMoleculeConfs,
        GetConformerRMS=GetConformerRMS,
        GetMorganFingerprintAsBitVect=GetMorganFingerprintAsBitVect,
    )
    allchem_attrs.update(chem_attrs)  # AllChem re-exports Chem in RDKit

    rdkit = _mod("rdkit")
    rdkit.__path__ = []  # mark as package
    Chem = _mod("rdkit.Chem", **chem_attrs)
    Chem.__path__ = []
    AllChem = _mod("rdkit.Chem.AllChem", **allchem_attrs)
    Descriptors = _mod("rdkit.Chem.Descriptors",
                       ExactMolWt=ExactMolWt, MolWt=ExactMolWt,
                       MolLogP=MolLogP, NumRotatableBonds=NumRotatableBonds,
                       NumHeteroatoms=NumHeteroatoms,
                       NumHAcceptors=NumHAcceptors, NumHDonors=NumHDonors)
    rdMolDescriptors = _mod("rdkit.Chem.rdMolDescriptors",
                            _CalcTPSAContribs=_CalcTPSAContribs,
                            _CalcLabuteASAContribs=_CalcLabuteASAContribs,
                            CalcNumRotatableBonds=NumRotatableBonds)
    enum_stereo = _mod("rdkit.Chem.EnumerateStereoisomers",
                       EnumerateStereoisomers=EnumerateStereoisomers)
    scaffolds = _mod("rdkit.Chem.Scaffolds")
    scaffolds.__path__ = []
    murcko = _mod("rdkit.Chem.Scaffolds.MurckoScaffold",
                  GetScaffoldForMol=GetScaffoldForMol)
    qed_mod = _mod("rdkit.Chem.QED", qed=qed)
    rdfmcs = _mod("rdkit.Chem.rdFMCS", FindMCS=FindMCS)
    geometry = _mod("rdkit.Geometry", Point3D=Point3D)

    Chem.AllChem = AllChem
    Chem.Descriptors = Descriptors
    Chem.rdMolDescriptors = rdMolDescriptors
    Chem.EnumerateStereoisomers = enum_stereo
    Chem.Scaffolds = scaffolds
    Chem.QED = qed_mod
    Chem.rdFMCS = rdfmcs
    scaffolds.MurckoScaffold = murcko
    rdkit.Chem = Chem
    rdkit.Geometry = geometry
    rdkit.__fake__ = this

    return {
        "rdkit": rdkit,
        "rdkit.Chem": Chem,
        "rdkit.Chem.AllChem": AllChem,
        "rdkit.Chem.Descriptors": Descriptors,
        "rdkit.Chem.rdMolDescriptors": rdMolDescriptors,
        "rdkit.Chem.EnumerateStereoisomers": enum_stereo,
        "rdkit.Chem.Scaffolds": scaffolds,
        "rdkit.Chem.Scaffolds.MurckoScaffold": murcko,
        "rdkit.Chem.QED": qed_mod,
        "rdkit.Chem.rdFMCS": rdfmcs,
        "rdkit.Geometry": geometry,
    }


def install():
    """Register the fake rdkit modules and flip HAS_RDKIT everywhere."""
    global _SAVED_MODULES, _FLIPPED
    if _SAVED_MODULES is not None:
        return sys.modules["rdkit"]
    mods = _build_modules()
    _SAVED_MODULES = {name: sys.modules.get(name) for name in mods}
    sys.modules.update(mods)
    _FLIPPED = []
    for name, mod in list(sys.modules.items()):
        if name.startswith("hierdiff_tpu") and hasattr(mod, "HAS_RDKIT"):
            _FLIPPED.append(mod)
            mod.HAS_RDKIT = True
    return mods["rdkit"]


def uninstall():
    global _SAVED_MODULES, _FLIPPED, FAIL_EMBED
    if _SAVED_MODULES is None:
        return
    for name, prev in _SAVED_MODULES.items():
        if prev is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = prev
    _SAVED_MODULES = None
    FAIL_EMBED = False
    # cal_sas imports the contrib sascorer via sys.path.append; drop both so
    # a real-RDKit process never sees the fake scorer after uninstall
    sys.modules.pop("sascorer", None)
    import os
    contrib = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fake_rdkit_contrib")
    sys.path[:] = [p for p in sys.path
                   if not os.path.abspath(p).startswith(contrib)]
    # re-probe reality: every hierdiff module that saw True goes back to False
    import importlib.util
    try:
        real = importlib.util.find_spec("rdkit") is not None
    except ValueError:
        # a leftover stub module with __spec__=None (e.g. the golden-parity
        # suite's inert rdkit stubs, test_reference_parity_full._mod) makes
        # find_spec raise instead of answering; a spec-less module is not a
        # real installation
        real = False
    for name, mod in list(sys.modules.items()):
        if name.startswith("hierdiff_tpu") and hasattr(mod, "HAS_RDKIT"):
            mod.HAS_RDKIT = real
    _FLIPPED = []
