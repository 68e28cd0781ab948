"""Multi-peptide conditional RTB fine-tuning CLI
(reference src/outsourced_train_conditional_posterior.py).

Same machinery as train_posterior — the policies are conditioned per batch
element and VarGrad estimates per-peptide logZ — with vargrad on by default.
"""
from __future__ import annotations

from .train_posterior import main as _main


def main(argv=None):
    argv = list(argv) if argv is not None else None
    if argv is not None and "--vargrad" not in argv:
        argv.append("--vargrad")
    return _main(argv)


if __name__ == "__main__":
    import sys

    main(sys.argv[1:] + (["--vargrad"] if "--vargrad" not in sys.argv else []))
