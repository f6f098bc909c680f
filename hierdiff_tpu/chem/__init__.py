"""Host-side chemistry toolkit (RDKit-gated).

The reference's chemutils / jtnn / eval chemistry defines the DATA SEMANTICS
(fragment vocabulary, junction-tree decomposition, assembly validity) that
the device models are trained against — it stays host-side Python here
(SURVEY §7 design stance #5), parallelized with process pools.

RDKit availability is probed once; modules that need it raise a clear
``RDKitUnavailable`` at call time instead of failing at import, so the
TPU compute path works in RDKit-less environments.
"""

from __future__ import annotations

try:
    import rdkit  # noqa: F401
    HAS_RDKIT = True
except ImportError:
    HAS_RDKIT = False


class RDKitUnavailable(RuntimeError):
    def __init__(self, what: str = "this operation"):
        super().__init__(
            f"RDKit is required for {what} but is not installed in this "
            "environment. The TPU model/sampling path works without it; "
            "install rdkit for chemistry (tree_decomp, assembly, eval).")


def require_rdkit(what: str = "this operation"):
    if not HAS_RDKIT:
        raise RDKitUnavailable(what)
