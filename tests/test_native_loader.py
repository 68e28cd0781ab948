"""C++ native loader: build, format parity with the Python pipeline, throughput."""
import os

import numpy as np
import pytest

from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
from mdgen_finetune_tpu.geometry.tables import str_sequence_to_aatype


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("native"))
    make_synthetic_dataset(d, ["AGHK", "LMNP"[0:3] + "A"], num_frames=50)
    return d


def test_native_loader_batches(data):
    pytest.importorskip("ctypes")
    from mdgen_finetune_tpu.native import NativeLoader, build_native_library

    build_native_library()
    files = [
        (os.path.join(data, "AGHK.npy"), str_sequence_to_aatype("AGHK")),
        (os.path.join(data, "LMNA.npy"), str_sequence_to_aatype("LMNA")),
    ]
    loader = NativeLoader(files, batch_size=3, num_frames=8, crop=4, seed=0, n_threads=1)
    for _ in range(5):
        b = next(loader)
        assert b["atom14"].shape == (3, 8, 4, 14, 3)
        assert np.isfinite(b["atom14"]).all()
        assert (b["mask"] == 1).all()  # L == crop, no padding
        assert b["seqres"].min() >= 0 and b["seqres"].max() < 20
        # values must exist in the source files (f16 -> f32 conversion exact)
        src = np.load(files[0][0]).astype(np.float32)
        src2 = np.load(files[1][0]).astype(np.float32)
        frame = b["atom14"][0, 0]
        found = any(
            np.abs(s - frame).max() < 1e-6 for s in np.concatenate([src, src2])
        )
        assert found, "batch frame not found in source data"
    loader.close()


def test_native_loader_crop_and_pad(data):
    from mdgen_finetune_tpu.native import NativeLoader

    files = [(os.path.join(data, "AGHK.npy"), str_sequence_to_aatype("AGHK"))]
    # crop 6 > L=4: padded residues masked out
    loader = NativeLoader(files, batch_size=2, num_frames=4, crop=6, seed=0, n_threads=1)
    b = next(loader)
    assert (b["mask"][:, :4] == 1).all() and (b["mask"][:, 4:] == 0).all()
    assert (b["atom14"][:, :, 4:] == 0).all()
    loader.close()
    # crop 2 < L=4: random contiguous window
    loader = NativeLoader(files, batch_size=2, num_frames=4, crop=2, seed=0, n_threads=1)
    b = next(loader)
    assert b["atom14"].shape[2] == 2 and (b["mask"] == 1).all()
    loader.close()
