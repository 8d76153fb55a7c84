"""dist/olkg.zip freshness guard.

The north_rule's run mode is ``spark-submit --py-files dist/olkg.zip``; a
stale zip silently ships old code to every executor.  This test hashes every
``olkg/*.py`` module against the corresponding zip member so any drift —
a modified module, a new module missing from the zip, or a deleted module
lingering in it — fails the suite.  Fix: ``sh scripts/make_pyfiles.sh``.
"""

import hashlib
import pathlib
import subprocess
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _md5(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


@pytest.fixture(scope="session")
def built_zip() -> pathlib.Path:
    """dist/ is a gitignored build artifact — on a fresh checkout it does
    not exist yet, so build it here (the same script a deployer runs)
    instead of failing the suite; the strict drift check below then guards
    a STALE zip, which is the actual hazard."""
    zip_path = REPO / "dist" / "olkg.zip"
    if not zip_path.exists():
        subprocess.run(["sh", str(REPO / "scripts" / "make_pyfiles.sh")],
                       check=True, cwd=REPO, capture_output=True)
    return zip_path


def test_pyfiles_zip_matches_source_tree(built_zip):
    zip_path = built_zip
    assert zip_path.exists(), "dist/olkg.zip missing — run scripts/make_pyfiles.sh"

    src = {str(p.relative_to(REPO)): _md5(p.read_bytes())
           for p in sorted((REPO / "olkg").glob("*.py"))}
    with zipfile.ZipFile(zip_path) as z:
        members = {n: _md5(z.read(n)) for n in z.namelist()
                   if n.endswith(".py")}

    missing = sorted(set(src) - set(members))
    extra = sorted(set(members) - set(src))
    stale = sorted(n for n in set(src) & set(members)
                   if src[n] != members[n])
    assert not (missing or extra or stale), (
        f"dist/olkg.zip drifted from olkg/ — missing={missing} "
        f"extra={extra} stale={stale}; run scripts/make_pyfiles.sh")
