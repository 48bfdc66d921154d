"""Rotation ledger: per-query implementation digests for the driver gate.

The driver's oracle gate verifies only the first ~``HEAD_WINDOW`` entries
of ``__spark_entry__.queries()`` per round, so entries past the window
("the tail") carry green rows from an EARLIER round.  That is only sound
while the code behind a tail entry is byte-identical to what the green
row verified — the round-2 contract violation was exactly a helper-module
refactor (`operators/similarity.py`) behind three tail entries whose green
rows predated it.

This tool computes, for every registered query, a digest over:

- the registered callable's own source,
- the source of every same-package function/class it (transitively)
  references, discovered by resolving the AST root names of each function
  body against its module namespace — so a refactor in a helper module
  (the round-2 failure mode) changes the digest of every entry that uses
  it, while unrelated edits to a shared module do not,
- the file content of every same-package module it references via
  attribute access (``D.minhash_signatures`` style),
- the entry's oracle SQL string (an oracle edit invalidates the green row
  just as surely as a plan edit).

``python tools/rotation_ledger.py`` rewrites the manifest
(`tests/golden/rotation_ledger.json`).  Regenerate it ONLY when setting
the rotation for a new round, i.e. when every tail entry is either
freshly driver-verified or unchanged since its last green row;
`tests/test_rotation_ledger.py` then fails if a tail entry's digest
drifts from the manifest — making silent tail changes mechanically
impossible to ship.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PACKAGE = "logistream_data_pipeline_aws_spark"
HEAD_WINDOW = 50
MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "rotation_ledger.json",
)


def _parse(src: str) -> ast.AST:
    try:
        return ast.parse(src)
    except SyntaxError:
        # getsource of a decorated/indented def: dedent and retry
        import textwrap

        return ast.parse(textwrap.dedent(src))


def _root_names(tree: ast.AST) -> set[str]:
    """Every identifier that could resolve to a module-level binding:
    plain names plus the root of each attribute chain."""
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
    return names


def _local_import_modules(tree: ast.AST) -> set[str]:
    """Package modules pulled in by imports INSIDE the function body
    (``from <pkg>.functions.vectors import dot`` style) — these never
    appear in the enclosing module's namespace, so name resolution alone
    would miss them.

    ``from <pkg>.operators import pq`` imports a MODULE as the alias:
    recording only ``node.module`` would digest the subpackage's
    ``__init__.py`` and silently skip ``pq.py`` — a round-7 continuation
    finding (pq.py edits escaped the pin).  Every ``<module>.<alias>``
    candidate is recorded too; ``entry_digest`` keeps only the ones that
    import as real modules."""
    mods: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            if node.module == PACKAGE or node.module.startswith(PACKAGE + "."):
                mods.add(node.module)
                for alias in node.names:
                    mods.add(node.module + "." + alias.name)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name == PACKAGE or alias.name.startswith(PACKAGE + "."):
                    mods.add(alias.name)
    return mods


def _in_package(obj: object) -> bool:
    mod = getattr(obj, "__module__", None)
    if isinstance(obj, types.ModuleType):
        mod = obj.__name__
    return bool(mod) and (mod == PACKAGE or str(mod).startswith(PACKAGE + "."))


def entry_digest(fn: types.FunctionType, oracle: str | None) -> str:
    """Transitive implementation digest of one registered query."""
    seen_fns: set[object] = set()
    module_files: set[str] = set()
    sources: list[str] = []
    stack = [fn]
    while stack:
        f = stack.pop()
        if f in seen_fns:
            continue
        seen_fns.add(f)
        try:
            src = inspect.getsource(f)
        except (OSError, TypeError):
            continue
        sources.append(src)
        tree = _parse(src)
        for mod_name in sorted(_local_import_modules(tree)):
            try:
                import importlib

                mod = importlib.import_module(mod_name)
            except ImportError:
                continue
            if getattr(mod, "__file__", None):
                module_files.add(mod.__file__)
        module = sys.modules.get(getattr(f, "__module__", ""), None)
        if module is None:
            continue
        for name in sorted(_root_names(tree)):
            obj = getattr(module, name, None)
            if obj is None:
                continue
            if isinstance(obj, types.ModuleType):
                if _in_package(obj) and getattr(obj, "__file__", None):
                    module_files.add(obj.__file__)
            elif isinstance(obj, (types.FunctionType, type)) and _in_package(obj):
                stack.append(obj)
    h = hashlib.sha256()
    for src in sorted(sources):
        h.update(src.encode())
    for path in sorted(module_files):
        with open(path, "rb") as fh:
            h.update(hashlib.sha256(fh.read()).digest())
    if oracle is not None:
        h.update(oracle.encode())
    return h.hexdigest()


def compute_digests() -> dict[str, str]:
    import __spark_entry__ as E

    oracles = E.oracle_sql()
    return {
        name: entry_digest(fn, oracles.get(name))
        for name, fn in E.queries().items()
    }


def main() -> None:
    digests = compute_digests()
    manifest = {
        "_comment": (
            "Implementation digests at the time the current rotation was "
            "set; regenerate with tools/rotation_ledger.py ONLY when "
            "re-rotating queries() for a new round."
        ),
        "head_window": HEAD_WINDOW,
        "entries": digests,
    }
    with open(MANIFEST_PATH, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {MANIFEST_PATH} ({len(digests)} entries)")


if __name__ == "__main__":
    main()
