#!/usr/bin/env python3
"""Code-quality scoring over the engine's own modules — the analogue of
the reference's only runnable root utilities
(`getCodeQualityScores.py:8-52`: pylint score + pycodestyle error-count
score per file; `deb.py:6-21`: single-file pylint run).

The reference scores the LLM-generated pipeline scripts; this repo's
equivalent surface is its own library + scripts, so that is what gets
scored.  Same 0-10 scale, same per-file report line, same
``10 - errors/10`` pycodestyle heuristic (`getCodeQualityScores.py:33`).

pylint/pycodestyle are not installed in this sandbox (no network pip —
SCALE.md "Delta Lake status" documents the constraint); when available
they are used directly, otherwise a self-contained fallback checker
scores the same dimensions the two tools would flag most often:

- style (pycodestyle-shaped): line length > 100, trailing whitespace,
  tabs, missing final newline
- lint (pylint-shaped): syntax errors (fatal), bare ``except:``,
  mutable default arguments, unused imports, ``== None`` comparisons,
  missing module docstring

Run:  python scripts/quality_scores.py [dir ...]
Exit code 1 if any file scores below 9.0 on either scale.
"""

from __future__ import annotations

import ast
import io
import re
import sys
import tokenize
from pathlib import Path

MAX_LINE = 100  # repo convention (pycodestyle default is 79)
FAIL_UNDER = 9.0


def _style_errors(path: Path) -> int:
    """pycodestyle-shaped error count (fallback path)."""
    text = path.read_text()
    errors = 0
    lines = text.splitlines()
    for ln in lines:
        if len(ln) > MAX_LINE:
            errors += 1
        if ln != ln.rstrip():
            errors += 1
        if "\t" in ln:
            errors += 1
    if text and not text.endswith("\n"):
        errors += 1
    return errors


class _LintVisitor(ast.NodeVisitor):
    def __init__(self) -> None:
        self.messages: list[str] = []
        self._imported: dict[str, int] = {}
        self._used: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self._imported[name] = node.lineno
        self.generic_visit(node)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        for a in node.names:
            if a.name != "*":
                self._imported[a.asname or a.name] = node.lineno
        self.generic_visit(node)

    def visit_Name(self, node: ast.Name) -> None:
        self._used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)

    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.type is None:
            self.messages.append(f"{node.lineno}: bare except")
        self.generic_visit(node)

    def _check_defaults(self, node: ast.AST) -> None:
        for d in getattr(node, "args", node).defaults + getattr(
            node.args, "kw_defaults", []
        ):
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.messages.append(
                    f"{node.lineno}: mutable default argument"
                )

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_Compare(self, node: ast.Compare) -> None:
        for op, right in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)) and (
                isinstance(right, ast.Constant) and right.value is None
            ):
                self.messages.append(f"{node.lineno}: ==/!= None comparison")
        self.generic_visit(node)

    def unused_imports(self, source: str) -> list[str]:
        out = []
        for name, lineno in self._imported.items():
            if name not in self._used and not re.search(
                rf"\b{re.escape(name)}\b", source.split("\n", lineno)[-1]
            ):
                out.append(f"{lineno}: unused import {name}")
        return out


def _lint_score(path: Path) -> tuple[float, list[str]]:
    """pylint-shaped 0-10 score (fallback path): start at 10, subtract
    0.25 per message — syntax errors are fatal (score 0), matching
    pylint's fatal-error behavior."""
    source = path.read_text()
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as exc:
        return 0.0, [f"{exc.lineno}: syntax error: {exc.msg}"]
    try:
        list(tokenize.generate_tokens(io.StringIO(source).readline))
    except tokenize.TokenError as exc:
        return 0.0, [f"tokenize error: {exc}"]
    v = _LintVisitor()
    v.visit(tree)
    messages = list(v.messages)
    messages += v.unused_imports(source)
    if tree.body and ast.get_docstring(tree) is None:
        messages.append("1: missing module docstring")
    return max(0.0, 10.0 - 0.25 * len(messages)), messages


def score_file(path: Path, verbose: bool = False) -> tuple[float, float]:
    try:
        import pycodestyle  # noqa: F401 — preferred when installed

        style = pycodestyle.StyleGuide(quiet=True, max_line_length=MAX_LINE)
        report = style.check_files([str(path)])
        style_errors = getattr(report, "total_errors", 0)
    except ImportError:
        style_errors = _style_errors(path)
    pep8 = round(max(0.0, 10 - style_errors / 10), 2)  # reference heuristic

    try:
        import subprocess

        res = subprocess.run(
            ["pylint", str(path)], capture_output=True, text=True
        )
        m = re.findall(r"rated at ([0-9.]+)/10", res.stdout)
        lint, msgs = (float(m[-1]), []) if m else _lint_score(path)
    except (ImportError, FileNotFoundError):
        lint, msgs = _lint_score(path)
    if verbose:
        for msg in msgs:
            print(f"    {path}:{msg}")
    return lint, pep8


def main() -> int:
    roots = [Path(p) for p in sys.argv[1:]] or [
        Path("data_pipelines_using_llm_spark"),
        Path("scripts"),
        Path("__spark_entry__.py"),
        Path("bench.py"),
    ]
    files: list[Path] = []
    for r in roots:
        files += sorted(r.rglob("*.py")) if r.is_dir() else [r]
    worst = 10.0
    for f in files:
        lint, pep8 = score_file(f, verbose="-v" in sys.argv)
        worst = min(worst, lint, pep8)
        flag = "  <-- below bar" if min(lint, pep8) < FAIL_UNDER else ""
        print(
            f"{str(f):68s} Pylint Score: {lint:5.2f}/10 "
            f"PEP8 Score: {pep8:5.2f}/10{flag}"
        )
    print("*" * 29)
    print(f"files: {len(files)}  worst: {worst:.2f}  bar: {FAIL_UNDER}")
    return 0 if worst >= FAIL_UNDER else 1


if __name__ == "__main__":
    sys.exit(main())
