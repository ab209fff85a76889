"""SURVEY.md §8's registry map is GENERATED (tools/gen_survey_map.py);
this pins the committed doc to the loaded registry so the table can
never drift from the code again (it drifted in rounds 4 and 5)."""

from __future__ import annotations

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_survey_registry_map_in_sync():
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "tools", "gen_survey_map.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stdout + out.stderr


def test_operators_doc_in_sync():
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "tools", "gen_operators_doc.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stdout + out.stderr
