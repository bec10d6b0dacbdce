#!/usr/bin/env python3
"""One-command lint/format gate (reference: scripts/check_format.sh).

The image ships no ruff/yapf/clang-format and installs are not
possible, so this is a self-contained gate over what matters for this
repo: syntax, PEP8 line length, whitespace hygiene, unused imports
(AST-based), leftover debug hooks, and a -Wall -Wextra syntax pass over
the native C++ engine.

Usage::

    python scripts/check.py            # check (exit 1 on findings)
"""

import ast
import pathlib
import py_compile
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
PY_DIRS = ('tnco_tpu', 'tests', 'benchmarks')
MAX_LINE = 79


def iter_py():
    for d in PY_DIRS:
        yield from sorted((ROOT / d).rglob('*.py'))
    yield ROOT / 'bench.py'
    yield ROOT / '__graft_entry__.py'


def check_file(path: pathlib.Path) -> list[str]:
    problems = []
    rel = path.relative_to(ROOT)
    text = path.read_text()

    try:
        py_compile.compile(str(path), doraise=True,
                           cfile='/tmp/.checkgate.pyc')
    except py_compile.PyCompileError as exc:
        return [f'{rel}: syntax error: {exc.msg}']

    for ln, line in enumerate(text.splitlines(), 1):
        stripped = line.rstrip('\n')
        if len(stripped) > MAX_LINE and 'noqa' not in stripped:
            problems.append(f'{rel}:{ln}: line too long '
                            f'({len(stripped)} > {MAX_LINE})')
        if stripped != stripped.rstrip():
            problems.append(f'{rel}:{ln}: trailing whitespace')
        if '\t' in line:
            problems.append(f'{rel}:{ln}: tab character')
        if 'pdb.set_trace' in line or 'breakpoint()' in line:
            problems.append(f'{rel}:{ln}: leftover debugger hook')

    tree = ast.parse(text)
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = (alias.asname or alias.name).split('.')[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name == '*':
                    problems.append(
                        f'{rel}:{node.lineno}: star import')
                    continue
                imported[alias.asname or alias.name] = node.lineno
    used = {
        n.id for n in ast.walk(tree) if isinstance(n, ast.Name)
    } | {
        n.attr for n in ast.walk(tree) if isinstance(n, ast.Attribute)
    }
    # Names referenced in __all__ / docstring doctests count as used.
    used |= set(text.split())
    if path.name != '__init__.py':  # __init__ imports are re-exports
        for name, ln in sorted(imported.items()):
            if name not in used and not name.startswith('_'):
                problems.append(f'{rel}:{ln}: unused import {name!r}')
    return problems


def check_cpp() -> list[str]:
    src = ROOT / 'tnco_tpu' / 'native' / 'core.cpp'
    if not src.exists():
        return []
    proc = subprocess.run(
        ['g++', '-std=c++17', '-fsyntax-only', '-Wall', '-Wextra',
         '-Wpedantic', str(src)],
        capture_output=True, text=True)
    if proc.returncode or proc.stderr.strip():
        return [f'core.cpp: {line}'
                for line in proc.stderr.strip().splitlines()[:20]]
    return []


def main() -> int:
    problems = []
    for path in iter_py():
        if path.exists():
            problems.extend(check_file(path))
    problems.extend(check_cpp())
    for p in problems:
        print(p)
    print(f'{len(problems)} problem(s)')
    return 1 if problems else 0


if __name__ == '__main__':
    sys.exit(main())
