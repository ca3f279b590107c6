#!/usr/bin/env python
"""Dependency-free linter (the image has no flake8; CI installs the real
one — see ``.github/workflows/core.yml``).  Checks, per ``*.py`` file:

* the file parses (``ast.parse``) — syntax errors fail the build;
* no tabs in indentation, no trailing whitespace;
* unused ``import``/``from .. import`` names (module scope, simple cases);
* ``== None`` / ``!= None`` comparisons (E711);
* bare ``except:`` clauses (E722).

Exit status 0 iff no findings.  Usage: ``python scripts/lint.py DIR [DIR ..]``.
"""
import ast
import sys
from pathlib import Path

# names that look unused to the AST walk but are load-bearing
ALLOW_UNUSED = {"jax", "annotations"}


def check_file(path):
    problems = []
    text = path.read_text()
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    for i, line in enumerate(text.splitlines(), 1):
        if line.rstrip() != line:
            problems.append(f"{path}:{i}: trailing whitespace")
        stripped = line.lstrip(" ")
        if stripped.startswith("\t"):
            problems.append(f"{path}:{i}: tab in indentation")

    # --- unused module-scope imports -------------------------------------
    imported = {}  # name -> lineno
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass
    # names re-exported via __all__ count as used
    for node in tree.body:
        if (isinstance(node, ast.Assign) and node.targets
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "__all__"):
            for elt in ast.walk(node.value):
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    used.add(elt.value)
    lines = text.splitlines()
    for name, lineno in sorted(imported.items(), key=lambda t: t[1]):
        if name in used or name in ALLOW_UNUSED:
            continue
        if "noqa" in lines[lineno - 1]:
            continue
        problems.append(f"{path}:{lineno}: unused import '{name}'")

    for node in ast.walk(tree):
        if isinstance(node, ast.Compare):
            for op, cmp in zip(node.ops, node.comparators):
                if (isinstance(op, (ast.Eq, ast.NotEq))
                        and isinstance(cmp, ast.Constant)
                        and cmp.value is None):
                    problems.append(
                        f"{path}:{node.lineno}: comparison to None "
                        "should be 'is (not) None' (E711)")
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare 'except:' (E722)")
    return problems


def main(argv):
    roots = [Path(a) for a in argv] or [Path("thetis_tpu")]
    problems = []
    for root in roots:
        files = sorted(root.rglob("*.py")) if root.is_dir() else [root]
        for f in files:
            if "outputs" in f.parts or ".jax_cache" in f.parts:
                continue
            problems.extend(check_file(f))
    for p in problems:
        print(p)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
