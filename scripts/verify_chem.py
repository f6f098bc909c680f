"""verify-chem: certify the RDKit-gated chemistry layer in one command.

The chemistry layer (chem/chemutils.py, mol_tree.py, reconstruct.py,
mff_rmsd.py, eval/metrics.py) is CI-executed under the deterministic
fake-RDKit harness (tests/fake_rdkit.py) because RDKit is not installable in
the build environment. This entry point runs the SAME conformance suite
against REAL RDKit on any machine that has it, so the first RDKit machine
certifies the layer end-to-end and reports divergences:

    python scripts/verify_chem.py              # real RDKit (errors if absent)
    python scripts/verify_chem.py --backend fake   # the CI configuration

Under ``--backend real`` the suite's ``fake`` fixture becomes a no-op
(HIERDIFF_CHEM_BACKEND=real), tests marked ``fake_only`` (they poke stub
internals like FAIL_EMBED) are skipped, and every remaining test asserts the
identical reference-matched behavior — tree decomposition, MolTree building,
attachment enumeration, geometry-scored reconstruction, the assembly gate,
MFF-RMSD lift, the eval panel, and the vocab canonicalization anchors
(the 780 vocab.txt fragments are genuine RDKit canonical output, so
test_fake_canon_* double as real-vs-fake agreement checks). A failure list
here IS the divergence report to fix before trusting a real-data run
(docs/RUNBOOK.md).
"""

import argparse
import importlib.util
import os
import subprocess
import sys
from pathlib import Path

SUITE = ["tests/test_fake_chem.py", "tests/test_chem.py"]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--backend", choices=["real", "fake"], default="real")
    p.add_argument("-k", default=None, help="pytest -k filter")
    p.add_argument("pytest_args", nargs="*", help="extra pytest args")
    args = p.parse_args()

    root = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    if args.backend == "real":
        if importlib.util.find_spec("rdkit") is None:
            print("verify-chem: real RDKit is NOT importable on this machine.\n"
                  "Install rdkit (conda install -c conda-forge rdkit) and rerun;\n"
                  "or run `--backend fake` for the stub-based CI configuration.")
            return 2
        env["HIERDIFF_CHEM_BACKEND"] = "real"
    cmd = [sys.executable, "-m", "pytest", *SUITE, "-q", "-rs"]
    if args.k:
        cmd += ["-k", args.k]
    cmd += args.pytest_args
    print(f"verify-chem [{args.backend} backend]:", " ".join(cmd))
    rc = subprocess.call(cmd, cwd=root, env=env)
    if rc == 0:
        print(f"verify-chem: chemistry layer PASSES under the {args.backend} "
              "backend.")
    else:
        print("verify-chem: FAILURES above are the real-vs-fake divergence "
              "report — each failing test cites the reference behavior "
              "(file:line) it pins.")
    return rc


if __name__ == "__main__":
    sys.exit(main())
