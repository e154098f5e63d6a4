#!/usr/bin/env python
"""Local lint stand-in (this image has no flake8; CI runs the real one,
.github/workflows/linting.yml).  Checks: syntax, line length <= 84,
trailing whitespace, tab indentation, and module-level imports that are
never referenced.  `# noqa` on a line exempts it.

Usage: python tools/lint.py [paths...]   (default: repo tree)
"""

import ast
import os
import sys

MAX_LEN = 84
SKIP_DIRS = {".git", "__pycache__", "build", "dist", ".jax_cache",
             ".cache", "node_modules"}


def iter_py(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
            continue
        for root, dirs, files in os.walk(p):
            dirs[:] = [d for d in dirs if d not in SKIP_DIRS]
            for f in files:
                if f.endswith(".py"):
                    yield os.path.join(root, f)


def unused_imports(tree, src_lines):
    """Module-level imports whose bound name never appears elsewhere."""
    imports = {}  # name -> lineno
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imports[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imports[a.asname or a.name] = node.lineno
    if not imports:
        return []
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    out = []
    for name, lineno in imports.items():
        if name in used:
            continue
        line = src_lines[lineno - 1] if lineno <= len(src_lines) else ""
        if "noqa" in line:
            continue
        # re-exports are conventionally left alone in __init__ files
        out.append((lineno, f"unused import '{name}'"))
    return out


def lint_file(path):
    errs = []
    with open(path, encoding="utf-8") as f:
        src = f.read()
    lines = src.split("\n")
    try:
        tree = ast.parse(src, path)
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]
    for i, line in enumerate(lines, 1):
        if "noqa" in line:
            continue
        if len(line) > MAX_LEN:
            errs.append((i, f"line too long ({len(line)} > {MAX_LEN})"))
        if line != line.rstrip():
            errs.append((i, "trailing whitespace"))
        stripped = line.lstrip(" ")
        if stripped.startswith("\t"):
            errs.append((i, "tab indentation"))
    if not os.path.basename(path) == "__init__.py":
        errs.extend(unused_imports(tree, lines))
    return sorted(errs)


def main():
    paths = sys.argv[1:] or [os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))]
    n = 0
    for path in iter_py(paths):
        for lineno, msg in lint_file(path):
            print(f"{os.path.relpath(path)}:{lineno}: {msg}")
            n += 1
    if n:
        print(f"{n} issue(s)")
        sys.exit(1)
    print("lint clean")


if __name__ == "__main__":
    main()
