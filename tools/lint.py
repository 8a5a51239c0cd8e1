"""Dependency-free lint: syntax, unused imports, long lines, trailing
whitespace (the image ships no ruff/pyflakes; reference pins only
line-length via .ruff.toml).

Usage: python tools/lint.py [paths...]   (default: srtpu tools tests + root)
Exit code 1 if any finding.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 125   # reference .ruff.toml line-length


def _imported_names(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                yield node.lineno, (a.asname or a.name.split('.')[0])
        elif isinstance(node, ast.ImportFrom):
            if node.module == '__future__':
                continue   # compiler directive, never "used"
            for a in node.names:
                if a.name != '*':
                    yield node.lineno, (a.asname or a.name)


def _used_names(tree: ast.AST):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    # names referenced only in string annotations / __all__ strings
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.update(node.value.replace('[', ' ').replace(']', ' ')
                        .replace('.', ' ').split())
    return used


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    out = []
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [f'{path}:{e.lineno}: syntax error: {e.msg}']
    used = _used_names(tree)
    for lineno, name in _imported_names(tree):
        if name not in used and not name.startswith('_'):
            out.append(f'{path}:{lineno}: unused import: {name}')
    for i, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LINE:
            out.append(f'{path}:{i}: line too long ({len(line)} > {MAX_LINE})')
        if line != line.rstrip():
            out.append(f'{path}:{i}: trailing whitespace')
        if '\t' in line:
            out.append(f'{path}:{i}: tab character')
    return out


def main(argv: list[str]) -> int:
    roots = [Path(p) for p in argv] if argv else \
        [Path('srtpu'), Path('tools'), Path('tests'),
         *Path('.').glob('*.py')]
    findings = []
    for root in roots:
        files = [root] if root.is_file() else sorted(root.rglob('*.py'))
        for f in files:
            findings += lint_file(f)
    for line in findings:
        print(line)
    print(f'{len(findings)} finding(s)')
    return 1 if findings else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
