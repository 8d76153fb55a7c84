"""Freeze guard for the RSpec-port semantics tests.

The four ``test_*_semantics.py`` files are 1:1 ports of the reference's
RSpec examples (``/root/reference/specs``) and are the fidelity ANCHOR of
the whole oracle chain (ported specs → golden generator → DuckDB oracles).
Golden data and pipeline code are allowed to evolve together; the ports are
not — silent drift here would let the self-oracle loop close on itself.

This test hashes each port against ``tests/rspec_ports.manifest``.  An
INTENTIONAL semantics-port change (e.g. porting a new upstream spec) must
update the manifest in the same commit, making the change visible in review
rather than incidental.
"""

import hashlib
import pathlib

TESTS = pathlib.Path(__file__).resolve().parent


def test_rspec_ports_match_manifest():
    manifest = {}
    for line in (TESTS / "rspec_ports.manifest").read_text().splitlines():
        digest, name = line.split(None, 1)
        manifest[name.strip()] = digest

    current = {f"tests/{p.name}": hashlib.md5(p.read_bytes()).hexdigest()
               for p in sorted(TESTS.glob("test_*_semantics.py"))}

    assert current == manifest, (
        "RSpec-port semantics tests drifted from tests/rspec_ports.manifest "
        "— if the change is an intentional port update, regenerate the "
        "manifest in the same commit; otherwise revert the drift. "
        f"diff keys: {sorted(set(current.items()) ^ set(manifest.items()))}")
