#!/usr/bin/env python
"""Regenerate the SURVEY.md §8 registry map from plans/registry.py.

The §8 per-query table drifted from the registry twice (rounds 4 and 5
added queries the hand-written table never picked up), so it is now
emitted mechanically: this tool rewrites everything between the
BEGIN/END GENERATED markers in SURVEY.md from the loaded REGISTRY —
name, covered §2 operator ids, check tier (driver-window oracled /
pytest-oracled / rows-only), bench membership — plus the count summary
line. `tests/test_registry_docs.py` asserts the committed SURVEY.md is
in sync, so the table can no longer drift silently.

Usage: python tools/gen_survey_map.py [--check]
  --check: exit 1 if SURVEY.md is out of date instead of rewriting it.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

BEGIN = "<!-- BEGIN GENERATED REGISTRY MAP (tools/gen_survey_map.py) -->"
END = "<!-- END GENERATED REGISTRY MAP -->"


def render() -> str:
    from mlb_data_pipeline_spark.plans import REGISTRY, load_all

    load_all()
    names = sorted(REGISTRY)
    window = set(names[:50])
    oracled = [n for n in names if REGISTRY[n].oracle is not None]
    rows_only = [n for n in names if REGISTRY[n].oracle is None]
    lines = [
        BEGIN,
        "",
        f"**Registry: {len(names)} queries — {len(oracled)} oracled "
        f"({sum(1 for n in oracled if n in window)} inside the driver's 50-entry "
        f"window, {sum(1 for n in oracled if n not in window)} pytest-oracled under "
        f"the identical harness), {len(rows_only)} rows-only by design "
        f"(approx / now() / partition-id / Python-model / binary-sink — each "
        f"pytest-covered).** Bench headline set: "
        f"{sum(1 for n in names if REGISTRY[n].bench)} queries.",
        "",
        "| Query | Covers (§2 ids) | Check | Bench |",
        "|---|---|---|---|",
    ]
    for n in names:
        q = REGISTRY[n]
        if q.oracle is None:
            check = "rows-only + pytest"
        elif n in window:
            check = "driver-window oracled"
        else:
            check = "pytest-oracled"
        lines.append(
            f"| {n} | {q.covers or '—'} | {check} | {'yes' if q.bench else ''} |"
        )
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    check = "--check" in sys.argv
    path = os.path.join(_ROOT, "SURVEY.md")
    text = open(path).read()
    if BEGIN not in text or END not in text:
        print("SURVEY.md is missing the generated-map markers", file=sys.stderr)
        return 1
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    new = pre + render() + post
    if check:
        if new != text:
            print("SURVEY.md §8 registry map is OUT OF DATE — run tools/gen_survey_map.py")
            return 1
        print("SURVEY.md §8 registry map is in sync")
        return 0
    open(path, "w").write(new)
    print("SURVEY.md §8 registry map regenerated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
