"""Deterministic fake sascorer (RDKit contrib stand-in for CI).

Scores in the real scale [1, 10]; a crude size/ring/heteroatom formula so
eval/metrics.cal_sas executes with stable outputs.
"""


def calculateScore(mol) -> float:
    n = mol.GetNumHeavyAtoms()
    rings = mol.GetRingInfo().NumRings()
    het = sum(1 for a in mol.GetAtoms() if a.GetSymbol() not in ("C", "H"))
    score = 1.0 + 0.08 * n + 0.4 * rings + 0.15 * het
    return float(min(max(score, 1.0), 10.0))
