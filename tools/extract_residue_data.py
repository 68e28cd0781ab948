"""Dump the raw residue-constant *data* (AlphaFold's public chemical tables) to JSON.

The numeric content — atom names, chi-angle definitions, idealized rigid-group
atom coordinates — is public scientific data originating from AlphaFold
(DeepMind, Apache-2.0) and identical in every reimplementation (OpenFold, the
MDGen reference, this framework). We store only the *source data* here; every
derived table (default frames, atom14/atom37 index maps, masks) is computed by
``mdgen_finetune_tpu.geometry.tables`` with our own derivation code.

Usage: python tools/extract_residue_data.py
"""
import importlib.util
import json
import pathlib
import sys
import types

REF = "/root/reference/src/mdgen/residue_constants.py"
OUT = pathlib.Path(__file__).resolve().parent.parent / "mdgen_finetune_tpu" / "geometry" / "residue_data.json"


def main():
    try:
        import tree  # noqa: F401
    except ImportError:
        sys.modules["tree"] = types.ModuleType("tree")
    spec = importlib.util.spec_from_file_location("ref_rc", REF)
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)

    data = {
        "restypes": rc.restypes,
        "restype_1to3": rc.restype_1to3,
        "atom_types": rc.atom_types,
        "restype_name_to_atom14_names": {k: list(v) for k, v in rc.restype_name_to_atom14_names.items()},
        "chi_angles_atoms": {k: [list(a) for a in v] for k, v in rc.chi_angles_atoms.items()},
        "chi_angles_mask": [list(row) for row in rc.chi_angles_mask],
        "chi_pi_periodic": [list(row) for row in rc.chi_pi_periodic],
        "rigid_group_atom_positions": {
            k: [[name, int(g), [float(x) for x in pos]] for name, g, pos in v]
            for k, v in rc.rigid_group_atom_positions.items()
        },
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(data))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
