"""ATLAS data fetcher (cli/download_data.py vs reference
src/scripts/download_atlas.sh): offline tests via file:// mirror."""
import os
import zipfile

import pytest

from mdgen_finetune_tpu.cli.download_data import (
    entry_url, fetch_entry, main, read_split_names)


@pytest.fixture
def mirror(tmp_path):
    """Local file:// mirror with two fake ATLAS entries + a split CSV."""
    root = tmp_path / "mirror"
    names = ["1abc_A", "2xyz_B"]
    for name in names:
        d = root / name
        d.mkdir(parents=True)
        with zipfile.ZipFile(d / f"{name}_protein.zip", "w") as zf:
            zf.writestr(f"{name}.pdb", "ATOM fake\n")
            zf.writestr(f"{name}_R1.xtc", b"\x00\x01")
    split = tmp_path / "split.csv"
    split.write_text("name,seqres\n" + "".join(f"{n},AAAA\n" for n in names))
    return root.as_uri(), str(split), names


def test_read_split_names(mirror):
    _, split, names = mirror
    assert read_split_names(split) == names


def test_entry_url_matches_reference_layout():
    # reference wget target: ${BASE}/${name}/${name}_protein.zip
    assert entry_url("http://x/ATLAS", "1k5n_A") == \
        "http://x/ATLAS/1k5n_A/1k5n_A_protein.zip"


def test_fetch_unpacks_and_skips(mirror, tmp_path):
    base, _, names = mirror
    out = tmp_path / "out"
    got = fetch_entry(base, names[0], str(out))
    assert got and os.path.isfile(os.path.join(got, f"{names[0]}.pdb"))
    # second call: already present -> skip (resumable)
    assert fetch_entry(base, names[0], str(out)) is None


def test_main_end_to_end_and_dry_run(mirror, tmp_path, capsys):
    base, split, names = mirror
    out = tmp_path / "out"
    assert main(["--split", split, "--outdir", str(out), "--base_url", base]) == 0
    for name in names:
        assert os.path.isfile(out / name / f"{name}.pdb")
    # dry run prints URLs, touches nothing
    assert main(["--split", split, "--outdir", str(tmp_path / "dry"),
                 "--base_url", base, "--dry_run"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert any(names[0] in l for l in lines)
    assert not (tmp_path / "dry").exists()
