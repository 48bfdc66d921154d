"""The rotation contract, mechanically enforced (VERDICT r2 item #10).

The driver verifies only the first ~50 ``queries()`` entries per round, so
tail entries ride on green rows from an earlier round.  Round 2 broke the
contract: a helper refactor changed three tail entries after their last
green row.  These tests make that impossible to repeat silently — a tail
entry whose transitive implementation digest (own source + referenced
package functions/modules + oracle SQL) differs from the manifest snapshot
fails here until it is rotated into the head window and the manifest is
regenerated (``python tools/rotation_ledger.py``).

No Spark session needed: this is pure source inspection.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import __spark_entry__ as E
from rotation_ledger import HEAD_WINDOW, MANIFEST_PATH, compute_digests


def _manifest() -> dict:
    with open(MANIFEST_PATH) as fh:
        return json.load(fh)


def test_manifest_covers_every_entry():
    """Every registered query has a digest in the manifest (a new entry
    must be added via regeneration, which forces a rotation review)."""
    manifest = _manifest()
    missing = set(E.queries()) - set(manifest["entries"])
    assert not missing, (
        f"queries() entries missing from rotation_ledger.json: {sorted(missing)} "
        "— run tools/rotation_ledger.py as part of setting the rotation"
    )


def test_tail_entries_unchanged_since_manifest():
    """A tail entry (past the driver's verification window) must be
    byte-stable since the manifest was set — its green row predates this
    round, so ANY implementation/oracle drift invalidates it."""
    manifest = _manifest()
    current = compute_digests()
    names = list(E.queries())
    stale = [
        name
        for name in names[HEAD_WINDOW:]
        if current[name] != manifest["entries"].get(name)
    ]
    assert not stale, (
        f"tail entries changed since their recorded digest: {stale} — move "
        "them into the first "
        f"{HEAD_WINDOW} queries() entries (the driver-verified window) and "
        "regenerate the manifest with tools/rotation_ledger.py"
    )


def test_head_window_matches_tool_constant():
    """The documented window and the enforced window must agree."""
    assert _manifest()["head_window"] == HEAD_WINDOW
