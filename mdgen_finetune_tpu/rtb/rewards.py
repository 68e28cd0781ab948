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
        """atom14 (B, T, L, 14, 3) -> log_r (B,) averaged over frames."""
        e = self._energy_jit(jnp.asarray(atom14), jnp.asarray(aatype))
        return -jnp.mean(e, axis=-1) / self.temperature


class Amber14Reward:
    """OpenMM Amber14 potential-energy reward (src/rtb_utils/rewards.py:40-160)."""

    def __init__(self, temperature: float = 350.0, solvent: str = "implicit"):
        try:
            import openmm  # noqa: F401
            from openmm import app  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "OpenMM is not installed; use SurrogateReward or install openmm for Amber14 energies"
            ) from e
        self.temperature = temperature
        self.solvent = solvent

    def energy_from_pdb(self, pdb_path: str) -> np.ndarray:
        import openmm
        from openmm import app, unit

        pdb = app.PDBFile(pdb_path)
        if self.solvent == "implicit":
            ff = app.ForceField("amber14-all.xml", "implicit/gbn2.xml")
        else:
            ff = app.ForceField("amber14-all.xml", "amber14/tip3pfb.xml")
        modeller = app.Modeller(pdb.topology, pdb.positions)
        modeller.addHydrogens(ff)
        system = ff.createSystem(modeller.topology, nonbondedMethod=app.NoCutoff)
        integrator = openmm.LangevinMiddleIntegrator(
            self.temperature * unit.kelvin, 1 / unit.picosecond, 0.002 * unit.picoseconds
        )
        ctx = openmm.Context(system, integrator)
        ctx.setPositions(modeller.positions)
        state = ctx.getState(getEnergy=True)
        return np.asarray([state.getPotentialEnergy().value_in_unit(unit.kilojoule_per_mole)])

    def __call__(self, pdb_paths: list[str]) -> np.ndarray:
        """log_r = -E/temperature per path (src/rtb_utils/rewards.py:151)."""
        return np.array([-self.energy_from_pdb(p).mean() / self.temperature for p in pdb_paths])


def get_reward(kind: str = "auto", **kw):
    if kind in ("auto", "amber14"):
        try:
            return Amber14Reward(**kw)
        except ImportError:
            if kind == "amber14":
                raise
    return SurrogateReward()
