"""Reward oracles for RTB fine-tuning: log r(x) = -E(x) / temperature.

The reference scores rollouts with OpenMM Amber14 potential energies via PDB
files on disk (src/rtb_utils/rewards.py:40-160). Here:

- ``Amber14Reward`` wraps OpenMM when it is installed (same implicit-solvent
  gbn2 / explicit tip3pfb setup, LangevinMiddleIntegrator at 350 K), fed
  in-memory coordinates instead of pdb/xtc round-trips where possible;
- ``SurrogateReward`` is a differentiable JAX molecular-mechanics surrogate
  (idealized bond-length terms + steric clash repulsion) used when OpenMM is
  unavailable (tests, TPU-only hosts). It runs on-device and is jit/grad-safe,
  which also enables Langevin reward-gradient corrections the reference only
  supports through autograd of an external oracle.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import tables as rc

_IDEAL_BONDS = [  # (atom14 idx a, atom14 idx b, ideal length A) backbone
    (0, 1, 1.459),  # N-CA
    (1, 2, 1.525),  # CA-C
    (2, 3, 1.229),  # C=O
]
_PEPTIDE_BOND = 1.336  # C(i) - N(i+1)


class SurrogateReward:
    """log_r = -E/temperature with E = bonded deviations + clash repulsion."""

    def __init__(self, temperature: float = 1.0, k_bond: float = 100.0, k_clash: float = 10.0, clash_radius: float = 2.5):
        self.temperature = temperature
        self.k_bond = k_bond
        self.k_clash = k_clash
        self.clash_radius = clash_radius
        self._energy_jit = jax.jit(self._energy)

    def _energy(self, atom14: jnp.ndarray, aatype: jnp.ndarray) -> jnp.ndarray:
        """atom14 (..., L, 14, 3) -> per-frame energy (...,)."""
        mask = jnp.asarray(rc.RESTYPE_ATOM14_MASK)[aatype]  # (L, 14)
        e = 0.0
        for a, b, d0 in _IDEAL_BONDS:
            d = jnp.linalg.norm(atom14[..., a, :] - atom14[..., b, :], axis=-1)
            e = e + self.k_bond * jnp.sum((d - d0) ** 2, axis=-1)
        d = jnp.linalg.norm(atom14[..., 1:, 0, :] - atom14[..., :-1, 2, :], axis=-1)
        e = e + self.k_bond * jnp.sum((d - _PEPTIDE_BOND) ** 2, axis=-1)

        # steric clashes between atoms of non-adjacent residues
        L = atom14.shape[-3]
        pos = atom14.reshape(*atom14.shape[:-3], L * 14, 3)
        m = mask.reshape(-1)
        dist = jnp.linalg.norm(pos[..., :, None, :] - pos[..., None, :, :] + 1e-9, axis=-1)
        res_i = jnp.repeat(jnp.arange(L), 14)
        nonadj = jnp.abs(res_i[:, None] - res_i[None, :]) >= 2
        pair_mask = nonadj * m[:, None] * m[None, :]
        clash = jnp.maximum(self.clash_radius - dist, 0.0) ** 2
        e = e + 0.5 * self.k_clash * jnp.sum(clash * pair_mask, axis=(-1, -2))
        return e

    def __call__(self, atom14, aatype) -> jnp.ndarray:
        """atom14 (B, T, L, 14, 3) -> log_r (B,) averaged over frames.

        ``aatype`` is either one shared sequence (L,) or per-element
        sequences (B, L) — the conditional multi-peptide RTB batch scores
        each element with its OWN sequence (the reference's conditional
        variant, src/rtb_utils/gfn_diffusion.py:438-456)."""
        atom14 = jnp.asarray(atom14)
        aatype = jnp.asarray(aatype)
        if aatype.ndim == 2:
            e = jax.vmap(self._energy)(atom14, aatype)  # (B, T)
        else:
            e = self._energy_jit(atom14, aatype)
        return -jnp.mean(e, axis=-1) / self.temperature


def choose_platform() -> str:
    """'CUDA' if OpenMM exposes it, else 'CPU' (src/rtb_utils/rewards.py:24-37).

    On a TPU host OpenMM has no accelerator backend, so this resolves to CPU;
    the TPU never blocks on the reward — RTBTrainer's host-reward path runs it
    off the device step."""
    from openmm import Platform

    names = [Platform.getPlatform(i).getName() for i in range(Platform.getNumPlatforms())]
    return "CUDA" if "CUDA" in names else "CPU"


class Amber14Reward:
    """OpenMM Amber14 potential-energy reward over whole trajectories
    (src/rtb_utils/rewards.py:40-160).

    Matches the reference semantics: per-frame energies for every frame of
    each peptide's trajectory in ``tmp_dir``, grouped by 4-letter peptide
    prefix; implicit (amber14-all + gbn2, NoCutoff-equivalent createSystem,
    HBonds constraints) or explicit solvent (tip3pfb, addSolvent 1 nm
    padding, PME 1 nm cutoff, MonteCarloBarostat at 1 bar); hydrogens added
    at pH 7; LangevinMiddleIntegrator at 350 K; platform = CUDA-if-available
    (:24-37). Returns ``(logs, logrs)`` where ``logs[peptide]`` carries
    {'log_r', 'x', 'torsions'} for the target-distribution cache
    (src/rtb_utils/gfn_diffusion.py:296-310) and ``logrs`` aligns with
    ``paths``. Trajectories ride as multi-MODEL PDB files written by
    ``MDGenSimulator.fix_and_save_pdbs`` (no mdtraj/xtc dependency here).

    ``energy_backend``: optional ``(aatype (L,), xyz37 (37*L?, 3) angstrom) -> float``
    override so the grouping/caching/cleanup semantics are testable on hosts
    without OpenMM; when unset, OpenMM is required at construction.
    """

    def __init__(
        self,
        platform: str | None = None,
        implicit: bool = True,
        friction_coeff: float = 1.0,
        dt_fs: float = 2.0,
        energy_temperature: float = 1.0,
        energy_backend=None,
        cleanup: bool = True,
    ):
        self.implicit = implicit
        self.friction_coeff = friction_coeff
        self.dt_fs = dt_fs
        self.energy_temperature = energy_temperature
        self.energy_backend = energy_backend
        self.cleanup = cleanup
        self.platform_name = platform
        self._ff = None
        if energy_backend is None:
            try:
                import openmm  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "OpenMM is not installed; use SurrogateReward, or pass energy_backend="
                ) from e
            self.platform_name = platform or choose_platform()

    # ------------------------------------------------------------------
    def _forcefield(self):
        from openmm.app import ForceField

        if self._ff is None:
            if self.implicit:
                self._ff = ForceField("amber14-all.xml", "implicit/gbn2.xml")
            else:
                self._ff = ForceField("amber14-all.xml", "amber14/tip3pfb.xml")
        return self._ff

    def _openmm_frame_energy(self, topology, positions) -> float:
        """One frame -> potential energy in kJ/mol (rewards.py:110-146)."""
        import openmm
        from openmm import unit
        from openmm.app import HBonds, Modeller, PME, Simulation

        ff = self._forcefield()
        modeller = Modeller(topology, positions)
        modeller.addHydrogens(ff, pH=7)
        if self.implicit:
            system = ff.createSystem(modeller.topology, constraints=HBonds)
        else:
            modeller.addSolvent(ff, padding=1.0 * unit.nanometer)
            system = ff.createSystem(
                modeller.topology,
                nonbondedMethod=PME,
                nonbondedCutoff=1.0 * unit.nanometer,
                constraints=HBonds,
            )
        integrator = openmm.LangevinMiddleIntegrator(
            350 * unit.kelvin, self.friction_coeff / unit.picosecond, self.dt_fs * unit.femtosecond
        )
        sim = Simulation(
            modeller.topology, system, integrator,
            openmm.Platform.getPlatformByName(self.platform_name),
        )
        sim.context.setPositions(modeller.positions)
        if not self.implicit:
            system.addForce(openmm.MonteCarloBarostat(1 * unit.bar, 350 * unit.kelvin))
            sim.context.reinitialize(preserveState=True)
        state = sim.context.getState(getEnergy=True)
        return float(state.getPotentialEnergy().value_in_unit(unit.kilojoule_per_mole))

    # ------------------------------------------------------------------
    def energies_for_pdb(self, pdb_path: str) -> np.ndarray:
        """Per-MODEL energies (kJ/mol) for a (possibly multi-model) PDB."""
        if self.energy_backend is not None:
            from ..geometry.protein import from_pdb_models

            out = []
            for aatype, xyz in from_pdb_models(pdb_path):
                out.append(float(self.energy_backend(aatype, xyz)))
            return np.asarray(out, np.float64)

        from openmm.app import PDBFile

        pdb = PDBFile(pdb_path)
        n = pdb.getNumFrames()
        return np.asarray(
            [self._openmm_frame_energy(pdb.topology, pdb.getPositions(frame=i)) for i in range(n)],
            np.float64,
        )

    def __call__(self, paths: list[str] | None = None, tmp_dir: str | None = None,
                 data_path: str | None = None) -> tuple:
        """(logs, logrs) over every peptide trajectory found in ``tmp_dir``
        (rewards.py:70-160): logs[peptide] = {'log_r' (T,), 'x' (T, L*14, 3),
        'torsions'}, logrs (len(paths),) scattered per-peptide; the sampled
        pdb/trajectory files are removed afterwards (:152-155)."""
        import glob
        import os

        tmp_dir = tmp_dir or "."
        if paths is None:
            def frame_key(p):
                stem = os.path.basename(p)[:-4].split("_")
                return (stem[0], int(stem[-1]) if stem[-1].isdigit() else -1)

            paths = sorted(
                (p for p in glob.glob(os.path.join(tmp_dir, "*_*.pdb")) if not p.endswith("_traj.pdb")),
                key=frame_key,
            )
        peptides = sorted({os.path.basename(p).split("_")[0] for p in paths})
        logs, logrs = {}, np.zeros(len(paths), np.float64)
        for peptide in peptides:
            idx = [i for i, p in enumerate(paths) if peptide in os.path.basename(p)]
            if not idx:
                continue
            traj_path = os.path.join(tmp_dir, f"{peptide}_traj.pdb")
            if os.path.exists(traj_path):
                energies = self.energies_for_pdb(traj_path)
                from ..geometry.protein import from_pdb_models

                xyz = np.stack([x for _, x in from_pdb_models(traj_path)])
            else:
                energies = np.concatenate([self.energies_for_pdb(paths[i]) for i in idx])
                from ..geometry.protein import from_pdb_models

                xyz = np.stack([from_pdb_models(paths[i])[0][1] for i in idx])
            log_r = -energies / self.energy_temperature
            if len(idx) == len(energies):
                logrs[np.asarray(idx)] = log_r
            tor_path = os.path.join(tmp_dir, f"{peptide}_torsions.npy")
            torsions = np.load(tor_path) if os.path.exists(tor_path) else None
            logs[peptide] = {"log_r": log_r, "x": xyz, "torsions": torsions}
        if self.cleanup:
            for f in glob.glob(os.path.join(tmp_dir, "*.pdb")):
                os.remove(f)
        return logs, logrs


def get_reward(kind: str = "auto", **kw):
    if kind in ("auto", "amber14"):
        try:
            return Amber14Reward(**kw)
        except ImportError:
            if kind == "amber14":
                raise
    return SurrogateReward()
