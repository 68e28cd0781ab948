"""Ground-truth MD data generation CLI (reference src/scripts/run_peptide_sim.py).

Runs OpenMM Amber14 Langevin MD at 350 K per peptide (implicit gbn2 or
explicit tip3pfb solvent) and writes the trajectory; requires OpenMM (and a
starting structure per peptide — the reference builds one with pymol `fab`,
run_peptide_sim.py:33-51; here an extended-chain builder from idealized
geometry replaces pymol). Without OpenMM, the synthetic generator
(`python -m mdgen_finetune_tpu.cli.synth_data`) provides format-identical
training data.
"""
from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def build_extended_peptide(seqres: str) -> np.ndarray:
    """Extended-conformation atom14 starting structure from idealized geometry."""
    import jax.numpy as jnp

    from ..geometry import frames as G
    from ..geometry.rigid import Rigid
    from ..geometry.tables import str_sequence_to_aatype

    L = len(seqres)
    aatype = str_sequence_to_aatype(seqres)
    trans = np.stack([3.8 * np.arange(L), np.zeros(L), np.zeros(L)], -1).astype(np.float32)
    frames = Rigid.identity((1, L)).__class__(
        jnp.broadcast_to(jnp.eye(3), (1, L, 3, 3)), jnp.asarray(trans)[None]
    )
    torsions = np.zeros((1, L, 7, 2), np.float32)
    torsions[..., 1] = 1.0  # cos=1: all-trans
    atom14 = G.frames_torsions_to_atom14(frames, jnp.asarray(torsions), jnp.asarray(aatype)[None])
    return np.asarray(atom14)[0]


def simulate(name: str, seqres: str, args) -> str:
    import openmm
    from openmm import app, unit

    from ..geometry.protein import atom14_to_pdb
    from ..geometry.tables import str_sequence_to_aatype

    outdir = os.path.join(args.outdir, name)
    os.makedirs(outdir, exist_ok=True)
    start_pdb = os.path.join(outdir, f"{name}_start.pdb")
    atom14_to_pdb(build_extended_peptide(seqres)[None], str_sequence_to_aatype(seqres), start_pdb)

    pdb = app.PDBFile(start_pdb)
    if args.solvent == "implicit":
        ff = app.ForceField("amber14-all.xml", "implicit/gbn2.xml")
    else:
        ff = app.ForceField("amber14-all.xml", "amber14/tip3pfb.xml")
    modeller = app.Modeller(pdb.topology, pdb.positions)
    modeller.addHydrogens(ff)
    if args.solvent != "implicit":
        modeller.addSolvent(ff, padding=1.0 * unit.nanometer)
    system = ff.createSystem(
        modeller.topology,
        nonbondedMethod=app.PME if args.solvent != "implicit" else app.NoCutoff,
    )
    integrator = openmm.LangevinMiddleIntegrator(
        350 * unit.kelvin, 1 / unit.picosecond, 0.002 * unit.picoseconds
    )
    sim = app.Simulation(modeller.topology, system, integrator)
    sim.context.setPositions(modeller.positions)
    sim.minimizeEnergy()
    sim.step(10_000)  # NVT equilibration (run_peptide_sim.py:98)

    dcd = os.path.join(outdir, f"{name}.dcd")
    sim.reporters.append(app.DCDReporter(dcd, args.report_interval))
    sim.step(args.n_steps)
    return dcd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--splits", type=str, required=True)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--solvent", type=str, default="explicit", choices=["implicit", "explicit"])
    p.add_argument("--n_steps", type=int, default=50_000_000)
    p.add_argument("--report_interval", type=int, default=5000)
    p.add_argument("--worker_id", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=1)
    args = p.parse_args(argv)

    try:
        import openmm  # noqa: F401
    except ImportError:
        raise SystemExit(
            "OpenMM is not installed. Use `python -m mdgen_finetune_tpu.cli.synth_data` "
            "to generate synthetic training data instead."
        )

    with open(args.splits) as f:
        rows = list(csv.DictReader(f))
    for i, row in enumerate(rows):
        if i % args.num_workers != args.worker_id:  # SLURM-style striding (run_peptide_sim.py:131-140)
            continue
        print(simulate(row["name"], row["seqres"], args), flush=True)


if __name__ == "__main__":
    main()
