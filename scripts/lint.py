#!/usr/bin/env python
"""Dependency-free lint gate — the repo-local analogue of the reference's
fmt + clippy ``-D warnings`` gate on every CI job
(/root/reference/.github/workflows/check.yml).

Checks every tracked ``*.py`` file for:

* syntax errors (ast parse);
* unused imports (module and function scope; ``# noqa`` on the import line
  or a name listed in ``__all__`` exempts it; ``__init__.py`` re-exports are
  skipped entirely);
* tab characters and trailing whitespace.

Runs in the bare image (no ruff/flake8 available); CI additionally runs
ruff's critical-error set where pip is available.  Exit code 0 = clean.
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _imported_names(node: ast.AST):
    """Yield (bound_name, lineno) for an Import/ImportFrom node."""
    for alias in node.names:
        if alias.name == "*":
            continue
        bound = alias.asname or alias.name.split(".")[0]
        yield bound, node.lineno


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # `a.b.c` marks `a` used via the Name node already; nothing extra.
            pass
    return used


def _all_exports(tree: ast.Module) -> set:
    out = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant):
                                out.add(str(elt.value))
    return out


def check_file(path: pathlib.Path) -> list:
    errors = []
    text = path.read_text()
    lines = text.split("\n")
    for i, ln in enumerate(lines, 1):
        if "noqa" in ln:
            continue
        if ln != ln.rstrip():
            errors.append(f"{path}:{i}: trailing whitespace")
        if "\t" in ln:
            errors.append(f"{path}:{i}: tab character")
    try:
        tree = ast.parse(text, str(path))
    except SyntaxError as e:
        errors.append(f"{path}:{e.lineno}: syntax error: {e.msg}")
        return errors
    if path.name == "__init__.py":
        return errors  # re-export modules: imports are the point
    exempt = _all_exports(tree)
    used = _used_names(tree)
    for node in ast.walk(tree):
        if not isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        if isinstance(node, ast.ImportFrom) and node.module == "__future__":
            continue
        line = lines[node.lineno - 1]
        if "noqa" in line:
            continue
        for bound, lineno in _imported_names(node):
            if bound in exempt:
                continue
            # A name can be "used" by its own import only; require one more
            # appearance.  ast.walk gives no scoping, so this is a
            # may-be-unused heuristic biased to no false positives: any
            # other mention anywhere in the file counts as a use.
            mentions = sum(
                1
                for n in ast.walk(tree)
                if isinstance(n, ast.Name) and n.id == bound
            )
            if bound not in used or mentions == 0:
                errors.append(f"{path}:{lineno}: unused import '{bound}'")
    return errors


def main() -> int:
    targets = []
    for sub in ("sliceslice_tpu", "tests", "scripts", "examples", "benchmarks"):
        targets.extend(sorted((ROOT / sub).rglob("*.py")))
    targets.extend(sorted(ROOT.glob("*.py")))
    errors = []
    for path in targets:
        if "__pycache__" in path.parts:
            continue
        errors.extend(check_file(path))
    for e in errors:
        print(e)
    print(f"lint: {len(targets)} files, {len(errors)} errors")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
