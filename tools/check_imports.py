#!/usr/bin/env python
"""Verify every top-level import in the repo resolves without executing code.

Counterpart of reference tools/check_imports.py:42-137: AST-scan module-level
imports across the package and tools, skip TYPE_CHECKING blocks and relative
imports, and check resolvability with importlib.util.find_spec.
"""

from __future__ import annotations

import argparse
import ast
import importlib.util
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def top_level_imports(path: Path):
    tree = ast.parse(path.read_text(encoding="utf-8"))
    mods = set()

    class V(ast.NodeVisitor):
        def visit_FunctionDef(self, node):
            pass  # function-local imports are lazy/optional by convention

        def visit_AsyncFunctionDef(self, node):
            pass

        def visit_If(self, node):
            # Skip `if TYPE_CHECKING:` bodies.
            test = node.test
            is_tc = (isinstance(test, ast.Name) and test.id == "TYPE_CHECKING") or (
                isinstance(test, ast.Attribute) and test.attr == "TYPE_CHECKING"
            )
            if not is_tc:
                self.generic_visit(node)

        def visit_Import(self, node):
            for a in node.names:
                mods.add(a.name.split(".")[0])

        def visit_ImportFrom(self, node):
            if node.level == 0 and node.module:
                mods.add(node.module.split(".")[0])

    V().visit(tree)
    return mods


def main() -> None:
    p = argparse.ArgumentParser(description="check import resolvability")
    p.add_argument("--roots", nargs="*", default=["leanyolo_tpu", "tools"])
    args = p.parse_args()

    repo = Path(__file__).resolve().parents[1]
    missing = {}
    checked = set()
    for root in args.roots:
        for path in sorted((repo / root).rglob("*.py")):
            for mod in top_level_imports(path):
                if mod in checked:
                    continue
                checked.add(mod)
                try:
                    spec = importlib.util.find_spec(mod)
                except (ImportError, ModuleNotFoundError, ValueError):
                    spec = None
                if spec is None:
                    missing.setdefault(mod, []).append(str(path.relative_to(repo)))
    if missing:
        for mod, files in sorted(missing.items()):
            print(f"MISSING: {mod} (first seen in {files[0]})")
        raise SystemExit(1)
    print(f"all {len(checked)} top-level imports resolvable")


if __name__ == "__main__":
    main()
