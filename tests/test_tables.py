"""Parity of derived residue tables vs the reference's vendored AlphaFold constants."""
import importlib.util
import sys
import types

import numpy as np
import pytest

from mdgen_finetune_tpu.geometry import tables as T


@pytest.fixture(scope="module")
def ref_rc():
    try:
        import tree  # noqa: F401
    except ImportError:
        sys.modules["tree"] = types.ModuleType("tree")
    spec = importlib.util.spec_from_file_location("ref_rc", "/root/reference/src/mdgen/residue_constants.py")
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)
    return rc


def test_orders(ref_rc):
    assert T.restypes == ref_rc.restypes
    assert T.restype_order == ref_rc.restype_order
    assert T.atom_types == ref_rc.atom_types


def test_atom_maps(ref_rc):
    np.testing.assert_array_equal(T.RESTYPE_ATOM14_TO_ATOM37, ref_rc.RESTYPE_ATOM14_TO_ATOM37)
    np.testing.assert_array_equal(T.RESTYPE_ATOM37_TO_ATOM14, ref_rc.RESTYPE_ATOM37_TO_ATOM14)
    np.testing.assert_array_equal(T.RESTYPE_ATOM14_MASK, ref_rc.RESTYPE_ATOM14_MASK)
    np.testing.assert_array_equal(T.RESTYPE_ATOM37_MASK, ref_rc.RESTYPE_ATOM37_MASK)
    np.testing.assert_array_equal(T.restype_atom14_mask, ref_rc.restype_atom14_mask)


def test_rigid_group_constants(ref_rc):
    np.testing.assert_allclose(
        T.restype_rigid_group_default_frame, ref_rc.restype_rigid_group_default_frame, atol=1e-6
    )
    np.testing.assert_array_equal(T.restype_atom14_to_rigid_group, ref_rc.restype_atom14_to_rigid_group)
    np.testing.assert_allclose(
        T.restype_atom14_rigid_group_positions, ref_rc.restype_atom14_rigid_group_positions, atol=1e-6
    )


def test_chi_tables(ref_rc):
    np.testing.assert_array_equal(np.asarray(T.chi_angles_mask), np.asarray(ref_rc.chi_angles_mask))
    assert T.aatype_to_str_sequence([0, 1, 2, 20]) == ref_rc.aatype_to_str_sequence([0, 1, 2, 20])
