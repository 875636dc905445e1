"""Continuous enforcement of the reference's only real harness: code-
quality scoring (``getCodeQualityScores.py:8-52`` — pylint + pycodestyle
score per file, here via scripts/quality_scores.py's self-contained
fallback).  Round-6 verdict item 8: run it in the suite so a style
regression fails CI, not just an ad-hoc script invocation.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_quality_scores_pass_bar():
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "quality_scores.py"),
            str(REPO / "data_pipelines_using_llm_spark"),
            str(REPO / "scripts"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    tail = "\n".join(proc.stdout.splitlines()[-10:])
    assert proc.returncode == 0, f"quality bar failed:\n{tail}\n{proc.stderr[-500:]}"
