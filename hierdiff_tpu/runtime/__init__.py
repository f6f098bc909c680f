"""Native host runtime bindings (ctypes over libtreekit.so).

Builds lazily on first use (``make -C hierdiff_tpu/runtime``); every entry
point has a pure-Python fallback so the package works without a toolchain.
``treekit_available()`` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libtreekit.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
# verdict callback for the gated native beam search:
# (wid, neighbor-wid ptr, count) -> 0/1
_GATE_CB = ctypes.CFUNCTYPE(ctypes.c_int32, ctypes.c_int64,
                            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32)
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _stale() -> bool:
    """True when the committed source is newer than the built library.

    The .so is a build artifact (not in git); without this check a stale
    binary left from an earlier build would silently shadow a treekit.cpp
    edit and still pass the native/Python contract tests."""
    try:
        return (_DIR / "treekit.cpp").stat().st_mtime > _LIB_PATH.stat().st_mtime
    except OSError:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (not _LIB_PATH.exists() or _stale()) and not _build():
        if not _LIB_PATH.exists():
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.tk_dfs_bidirection.restype = ctypes.c_int32
    lib.tk_dfs_bidirection.argtypes = [
        _f64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        _i8p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]

    lib.tk_make_search_adj.restype = None
    lib.tk_make_search_adj.argtypes = [
        _f64p, ctypes.c_int32, _i8p, ctypes.c_int32, ctypes.c_int32,
        _f32p, _f32p]

    lib.tk_pack_denoise_batch.restype = None
    lib.tk_pack_denoise_batch.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        _i32p, _i64p, _i64p, _f32p, _f32p, _f64p, _i64p, ctypes.c_int32,
        _f32p, _f32p, _i32p, _i32p, _f32p, _f32p, _f32p, _f32p, _f32p,
        _i32p, _i32p, _i32p]

    lib.tk_pack_ar_fleet.restype = None
    lib.tk_pack_ar_fleet.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        _i32p, _i64p, _f32p, _f32p, _f32p, _i64p, _i64p, ctypes.c_int32,
        _f32p, _f32p, _f32p, _i32p, _i32p, _f32p]

    lib.tk_beam_search_lattice.restype = None
    lib.tk_beam_search_lattice.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        _i32p, _i64p, _i32p, _i32p, _i8p, _i64p, _f32p,
        _u32p, ctypes.POINTER(ctypes.c_int32), _i64p, _i8p, _f64p]

    lib.tk_beam_search_lattice_gated.restype = None
    lib.tk_beam_search_lattice_gated.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        _i32p, _i64p, _i32p, _i32p, _i8p, _i64p, _f32p,
        _u32p, ctypes.POINTER(ctypes.c_int32), _GATE_CB, ctypes.c_int32,
        _i64p, _i8p, _f64p]

    lib.tk_rsearch_create.restype = ctypes.c_void_p
    lib.tk_rsearch_create.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_double,
        _i32p, _i64p, _i32p, _i32p, _i8p, _i64p, _f32p,
        _u32p, ctypes.c_int32, _GATE_CB, _GATE_CB, ctypes.c_int32]

    lib.tk_rsearch_step.restype = ctypes.c_int32
    lib.tk_rsearch_step.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        _i32p, _i64p, _f32p]

    lib.tk_rsearch_finish.restype = None
    lib.tk_rsearch_finish.argtypes = [
        ctypes.c_void_p, _u32p, ctypes.POINTER(ctypes.c_int32),
        _i64p, _i8p, _f64p]

    lib.tk_rsearch_destroy.restype = None
    lib.tk_rsearch_destroy.argtypes = [ctypes.c_void_p]

    _lib = lib
    return lib


def treekit_available() -> bool:
    return _load() is not None


def dfs_bidirection_native(adj: np.ndarray, seed: int, sample_idx: int = -1):
    """Native dfs_bidirection; returns (undiscovered_mask, search_ind, last_ind).

    Contract is PINNED to ``data.orders.dfs_bidirection``: the mask excludes
    the search node (tests/test_runtime.py asserts equality for every DFS
    step). Exception: the root step (idx 0) marks all n nodes, mirroring the
    Python list [0..n-1] which includes search node 0."""
    lib = _load()
    assert lib is not None
    n = adj.shape[0]
    adj = np.ascontiguousarray(adj, np.float64)
    umask = np.zeros(n, np.uint8)
    s = ctypes.c_int32()
    l = ctypes.c_int32()
    lib.tk_dfs_bidirection(adj, n, sample_idx, seed, umask,
                           ctypes.byref(s), ctypes.byref(l))
    return umask, int(s.value), int(l.value)


def make_search_adj_native(adj: np.ndarray, umask: np.ndarray,
                           search_ind: int, last_ind: int):
    lib = _load()
    assert lib is not None
    n = adj.shape[0]
    adj = np.ascontiguousarray(adj, np.float64)
    org = np.zeros((n, n), np.float32)
    search = np.zeros((n, n), np.float32)
    lib.tk_make_search_adj(adj, n, np.ascontiguousarray(umask, np.uint8),
                           search_ind, last_ind, org, search)
    return org, search


def pack_denoise_batch_native(trees, max_n: int, seed: int,
                              undiscovered_token: int = 780) -> Dict[str, np.ndarray]:
    """Native equivalent of data.denoise.make_denoise_batch (full_softmax)."""
    lib = _load()
    assert lib is not None
    b = len(trees)
    f = trees[0].feats.shape[1]
    sizes = np.array([t.feats.shape[0] for t in trees], np.int32)
    node_offsets = np.zeros(b, np.int64)
    adj_offsets = np.zeros(b, np.int64)
    node_offsets[1:] = np.cumsum(sizes[:-1])
    adj_offsets[1:] = np.cumsum((sizes[:-1].astype(np.int64)) ** 2)
    feats_in = np.ascontiguousarray(np.concatenate([t.feats for t in trees]), np.float32)
    pos_in = np.ascontiguousarray(np.concatenate([t.pos for t in trees]), np.float32)
    adj_in = np.ascontiguousarray(np.concatenate([t.adj.ravel() for t in trees]), np.float64)
    wids_in = np.ascontiguousarray(np.concatenate([t.wids for t in trees]), np.int64)

    out = {
        "feats": np.zeros((b, max_n, f), np.float32),
        "pos": np.zeros((b, max_n, 3), np.float32),
        "discovered": np.zeros((b, max_n), np.int32),
        "vocab_idx": np.zeros((b, max_n), np.int32),
        "node_mask": np.zeros((b, max_n, 1), np.float32),
        "edge_mask": np.zeros((b, max_n, max_n), np.float32),
        "search_adj": np.zeros((b, max_n, max_n), np.float32),
        "focal_label": np.zeros((b, max_n), np.float32),
        "undiscovered": np.zeros((b, max_n), np.float32),
        "predict_idx": np.zeros(b, np.int32),
        "last_ind": np.zeros(b, np.int32),
        "label": np.zeros(b, np.int32),
    }
    lib.tk_pack_denoise_batch(
        b, max_n, f, seed, sizes, node_offsets, adj_offsets,
        feats_in, pos_in, adj_in, wids_in, undiscovered_token,
        out["feats"], out["pos"], out["discovered"], out["vocab_idx"],
        out["node_mask"].reshape(b, max_n), out["edge_mask"],
        out["search_adj"], out["focal_label"], out["undiscovered"],
        out["predict_idx"], out["last_ind"], out["label"])
    return out


def pack_ar_fleet_native(states, max_n: int, undiscovered_token: int = 780):
    """Native equivalent of sampling.ar.ARSampler._batch_step's packing."""
    lib = _load()
    assert lib is not None
    b = len(states)
    f = states[0].feats.shape[1]
    sizes = np.array([s.n for s in states], np.int32)
    node_offsets = np.zeros(b, np.int64)
    adj_offsets = np.zeros(b, np.int64)
    node_offsets[1:] = np.cumsum(sizes[:-1])
    adj_offsets[1:] = np.cumsum((sizes[:-1].astype(np.int64)) ** 2)
    feats_in = np.ascontiguousarray(np.concatenate([s.feats for s in states]), np.float32)
    pos_in = np.ascontiguousarray(np.concatenate([s.pos for s in states]), np.float32)
    adj_in = np.ascontiguousarray(
        np.concatenate([s.adj.astype(np.float32).ravel() for s in states]), np.float32)
    wids_in = np.ascontiguousarray(np.concatenate([s.wids for s in states]), np.int64)

    feats = np.zeros((b, max_n, f), np.float32)
    pos = np.zeros((b, max_n, 3), np.float32)
    adj = np.zeros((b, max_n, max_n), np.float32)
    vocab = np.zeros((b, max_n), np.int32)
    disc = np.zeros((b, max_n), np.int32)
    nmask = np.zeros((b, max_n, 1), np.float32)
    lib.tk_pack_ar_fleet(b, max_n, f, sizes, node_offsets, feats_in, pos_in,
                         adj_in, adj_offsets, wids_in, undiscovered_token,
                         feats, pos, adj, vocab, disc,
                         nmask.reshape(b, max_n))
    return feats, pos, adj, vocab, disc, nmask


def beam_search_lattice_native(lattices, sizes, beam_size: int, rng,
                               max_expansions_factor: int = 40,
                               verdict=None, retry_final_gate: bool = True):
    """Native PQ beam search over precomputed lattices (the ungated,
    no-refine-hook fast path of sampling.beam.PQBeamSearch +
    sampling.lattice.LatticeExpander).

    Bit-exact with the Python search: priorities are IEEE doubles
    accumulated in the same order, and the per-candidate 1e-8 tiebreak
    stream CONTINUES the caller's ``random.Random`` — its Mersenne state is
    passed in and written back, so interleaving native and Python searches
    on one rng gives identical draws (pinned in tests/test_runtime.py).

    lattices: {index: MoleculeLattice}; sizes: per-molecule node counts in
    index order. Returns (wids: list of M per-molecule int64 arrays of
    length n_i, -1-filled on failure; ok (M,) bool; logp (M,) float64).

    ``verdict(wid, sorted_neighbor_wids_tuple) -> bool`` enables the gated
    variant: per-candidate focal gate + final all-nodes gate, semantics of
    chem.assemble_gate (the search gathers/sorts typed neighbors natively
    and calls back only for the verdict, which stays lru-cached in Python).
    """
    lib = _load()
    assert lib is not None
    m = len(sizes)
    sizes32 = np.asarray(sizes, np.int32)
    offsets = np.zeros(m, np.int64)
    offsets[1:] = np.cumsum(sizes32[:-1])
    k = lattices[0].top_wid.shape[1]
    trim = [(lattices[i], int(sizes32[i])) for i in range(m)]
    focal = np.ascontiguousarray(
        np.concatenate([l.focal[:n] for l, n in trim]), np.int32)
    target = np.ascontiguousarray(
        np.concatenate([l.target[:n] for l, n in trim]), np.int32)
    attach = np.ascontiguousarray(
        np.concatenate([l.attach[:n] for l, n in trim]), np.uint8)
    top_wid = np.ascontiguousarray(
        np.concatenate([l.top_wid[:n] for l, n in trim]), np.int64)
    top_logp = np.ascontiguousarray(
        np.concatenate([l.top_logp[:n] for l, n in trim]), np.float32)
    total = int(sizes32.sum())

    version, state, gauss = rng.getstate()
    mt = np.asarray(state[:624], np.uint32)
    pos = ctypes.c_int32(state[624])
    out_wids = np.full(total, -1, np.int64)
    ok = np.zeros(m, np.uint8)
    logp = np.zeros(m, np.float64)
    if verdict is None:
        lib.tk_beam_search_lattice(
            m, k, beam_size, max_expansions_factor, sizes32, offsets,
            focal, target, attach,
            np.ascontiguousarray(top_wid), np.ascontiguousarray(top_logp),
            mt, ctypes.byref(pos), out_wids, ok, logp)
    else:
        # ctypes swallows callback exceptions and returns an undefined int —
        # which would silently corrupt the search (and poison the native
        # memo). Stash the first exception, fail the gate, and re-raise
        # after the native call returns.
        cb_error: list = []

        @_GATE_CB
        def _cb(wid, neis, n_nei):
            if cb_error:
                return 0
            try:
                return 1 if verdict(int(wid),
                                    tuple(neis[i] for i in range(n_nei))) else 0
            except BaseException as e:   # noqa: BLE001 — re-raised below
                cb_error.append(e)
                return 0

        lib.tk_beam_search_lattice_gated(
            m, k, beam_size, max_expansions_factor, sizes32, offsets,
            focal, target, attach,
            np.ascontiguousarray(top_wid), np.ascontiguousarray(top_logp),
            mt, ctypes.byref(pos), _cb, 1 if retry_final_gate else 0,
            out_wids, ok, logp)
        if cb_error:
            raise cb_error[0]
    rng.setstate((version, tuple(int(v) for v in mt) + (int(pos.value),), gauss))
    return ([out_wids[int(offsets[i]): int(offsets[i]) + int(sizes32[i])]
             for i in range(m)], ok.astype(bool), logp)


def _wrap_verdict(verdict, cb_error: list):
    """Verdict -> native gate callback; exceptions are stashed (ctypes
    swallows them and would return an undefined int) and re-raised by the
    caller after the native call returns."""
    if verdict is None:
        return ctypes.cast(None, _GATE_CB)

    @_GATE_CB
    def _cb(wid, neis, n_nei):
        if cb_error:
            return 0
        try:
            return 1 if verdict(int(wid),
                                tuple(neis[i] for i in range(n_nei))) else 0
        except BaseException as e:   # noqa: BLE001 — re-raised by caller
            cb_error.append(e)
            return 0

    return _cb


class NativeRefineSearch:
    """One molecule group's refine-on PQ beam search living in C++
    (tk_rsearch_*): the C++ side owns the queues, walks/commits the fused
    check results and expands; ``step`` returns the next active fleet for
    the caller to pad + dispatch through RefineHook._fused_fn.

    Bit-exact with the Python group search driven by
    lattice._sample_refine_pipelined for the same rng seed (pinned in
    tests/test_runtime.py). Lattice arrays are flattened once here and kept
    alive for the handle's lifetime.
    """

    def __init__(self, lattices, members, sizes, beam_size: int, rng,
                 max_n: int, check_frac: float, verdict=None,
                 hook_verdict=None, retry_final_gate: bool = True,
                 max_expansions_factor: int = 40):
        """members: molecule indices (keys into ``lattices``); sizes: node
        counts in member order. ``rng``'s Mersenne state seeds the tiebreak
        stream (the throwaway per-group rng of the pipelined search)."""
        lib = _load()
        assert lib is not None
        # Bit-exactness dependency (advisor round-4): the native fleet_adj is
        # rebuilt from attach steps only and omits the adj[0,0] root-marker
        # convention the Python _pack_states path ships to the fused check.
        # That is safe ONLY because a marker-bearing state (t=1, no attach)
        # can never pass the t*check_frac > 1 active filter when
        # check_frac <= 1 — enforce the invariant instead of assuming it.
        assert check_frac <= 1.0, (
            "NativeRefineSearch requires check_frac <= 1 (root-marker rows "
            "would otherwise reach the fused check with a different adj "
            "than the Python packer)")
        self._lib = lib
        m = len(members)
        self.n_mol = m
        self.max_n = int(max_n)
        sizes32 = np.asarray(sizes, np.int32)
        offsets = np.zeros(m, np.int64)
        offsets[1:] = np.cumsum(sizes32[:-1])
        self.sizes = sizes32
        self.offsets = offsets
        k = lattices[members[0]].top_wid.shape[1]
        trim = [(lattices[i], int(sizes32[j])) for j, i in enumerate(members)]
        focal = np.ascontiguousarray(
            np.concatenate([l.focal[:n] for l, n in trim]), np.int32)
        target = np.ascontiguousarray(
            np.concatenate([l.target[:n] for l, n in trim]), np.int32)
        attach = np.ascontiguousarray(
            np.concatenate([l.attach[:n] for l, n in trim]), np.uint8)
        top_wid = np.ascontiguousarray(
            np.concatenate([l.top_wid[:n] for l, n in trim]), np.int64)
        top_logp = np.ascontiguousarray(
            np.concatenate([l.top_logp[:n] for l, n in trim]), np.float32)
        # keep every borrowed array + callback alive for the handle
        self._keep = (focal, target, attach, top_wid, top_logp, sizes32,
                      offsets)
        self.cb_error: list = []
        self._gate_cb = _wrap_verdict(verdict, self.cb_error)
        self._hook_cb = _wrap_verdict(hook_verdict, self.cb_error)
        version, state, gauss = rng.getstate()
        mt = np.asarray(state[:624], np.uint32)
        self.fleet_mol = np.zeros(m, np.int32)
        self.fleet_wids = np.zeros((m, self.max_n), np.int64)
        self.fleet_adj = np.zeros((m, self.max_n, self.max_n), np.float32)
        self._handle = lib.tk_rsearch_create(
            m, k, beam_size, max_expansions_factor, self.max_n,
            float(check_frac), sizes32, offsets, focal, target, attach,
            top_wid, top_logp, mt, int(state[624]), self._gate_cb,
            self._hook_cb, 1 if retry_final_gate else 0)

    def step(self, packed: Optional[np.ndarray], K: int) -> int:
        """Advance one round. ``packed``: the previous fleet's fused-check
        results, (S_prev, 1+4K) f32 in active-row order (None first call).
        Returns the next active fleet's row count S (0 = done); rows are in
        ``fleet_mol`` / ``fleet_wids`` / ``fleet_adj`` [:S]."""
        if packed is None:
            buf = ctypes.c_void_p(None)
        else:
            packed = np.ascontiguousarray(packed, np.float32)
            buf = packed.ctypes.data_as(ctypes.c_void_p)
        s = self._lib.tk_rsearch_step(self._handle, buf, int(K),
                                      self.fleet_mol, self.fleet_wids,
                                      self.fleet_adj)
        if self.cb_error:
            self.close()
            raise self.cb_error[0]
        return int(s)

    def finish(self):
        """(wids list per member (-1-filled on failure), ok bool (M,),
        logp (M,) float64); destroys the handle."""
        mt = np.zeros(624, np.uint32)
        pos = ctypes.c_int32()
        total = int(self.offsets[-1]) + int(self.sizes[-1])
        out_wids = np.full(total, -1, np.int64)
        ok = np.zeros(self.n_mol, np.uint8)
        logp = np.zeros(self.n_mol, np.float64)
        self._lib.tk_rsearch_finish(self._handle, mt, ctypes.byref(pos),
                                    out_wids, ok, logp)
        self.close()
        return ([out_wids[int(self.offsets[i]):
                          int(self.offsets[i]) + int(self.sizes[i])]
                 for i in range(self.n_mol)], ok.astype(bool), logp)

    def close(self):
        if self._handle:
            self._lib.tk_rsearch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
