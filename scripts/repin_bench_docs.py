#!/usr/bin/env python3
"""Re-pin the README/SURVEY bench headline to the newest driver artifact.

VERDICT r8 task #1: every round the driver's BENCH_r{N}.json lands AFTER
the builder's final commit, so the README headline pinned by
tests/test_docs_counts.py::test_readme_bench_claims_match_driver_artifact
is stale by construction at round start.  This script makes the re-pin a
one-command chore: it recomputes (total, baseline total, aggregate ratio,
max per-query ratio, max/next query names) from the NEWEST protocol-
matching BENCH_r*.json x BASELINE.md — the exact arithmetic the gate
test performs — and rewrites the pinned lines in README.md and
SURVEY.md in place.  The gate test stays as the verifier; this is only
the mechanical editor.

Usage:  python scripts/repin_bench_docs.py        # rewrite in place
        python scripts/repin_bench_docs.py --check  # print, don't write
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def latest_bench():
    # canonical per-round artifacts only (BENCH_r<N>.json): the driver's
    # auxiliary low-core scaling run (BENCH_r<N>_c8.json) sorts AFTER the
    # canonical file and must never be pinned as the headline — the docs
    # gate's name regex rejects it, and its 8-core medians are not the
    # protocol the README ratio is defined over (r14 fix: the r13 repin
    # picked BENCH_r13_c8.json and broke the gate)
    benches = sorted(
        p for p in REPO.glob("BENCH_r*.json")
        if re.fullmatch(r"BENCH_r\d+\.json", p.name)
    )
    if not benches:
        raise SystemExit("no BENCH_r*.json artifacts found")
    doc = json.loads(benches[-1].read_text())
    if doc.get("parsed"):
        meds = dict(doc["parsed"].get("queries", {}))
        protocol = int(doc["parsed"].get("protocol", 1))
    else:
        meds = {
            q: float(v)
            for q, v in re.findall(
                r'"(q_\w+)": \{"median": ([0-9.]+)', doc.get("tail", "")
            )
        }
        m = re.search(r'"protocol": (\d+)', doc.get("tail", ""))
        protocol = int(m.group(1)) if m else 1
    return benches[-1].name, meds, protocol


def baseline():
    text = (REPO / "BASELINE.md").read_text()
    meds = {
        q: float(ms.replace(",", "")) / 1000.0
        for q, ms in re.findall(
            r"^\| (q_\w+)[^|]*\| \*\*([\d,]+) ms\*\*", text, re.M
        )
    }
    m = re.search(r"bench protocol (\d+)", text)
    return meds, (int(m.group(1)) if m else 1)


def main() -> int:
    check = "--check" in sys.argv
    name, meds, bench_proto = latest_bench()
    base, base_proto = baseline()
    if bench_proto != base_proto:
        raise SystemExit(
            f"{name} protocol {bench_proto} != BASELINE.md protocol "
            f"{base_proto}; ratios pair only like-for-like — re-measure "
            "the baseline first (scripts/baseline_measure.py)"
        )
    common = sorted(set(meds) & set(base))
    if len(common) < 18:
        raise SystemExit(f"only {len(common)} overlapping queries")
    total = sum(meds[q] for q in common)
    base_total = sum(base[q] for q in common)
    agg = total / base_total
    ratios = sorted(((meds[q] / base[q], q) for q in common), reverse=True)
    (max_r, max_q), (next_r, _next_q) = ratios[0], ratios[1]
    # Round the claimed max UP at the 2nd decimal so the gate's
    # `claimed_max >= max_ratio` holds (the gate allows +0.01 slack).
    import math

    max_claim = math.ceil(max_r * 100 - 1e-9) / 100

    headline = (
        f"**{total:.2f} s total vs {base_total:.2f} s vanilla-PySpark "
        f"baseline ({agg:.3f}×), every per-query ratio ≤ "
        f"{max_claim:.2f}×** ({max_q}; next {next_r:.2f}),"
    )
    print(f"artifact : {name} (protocol {bench_proto}, {len(common)} queries)")
    print(f"headline : {headline}")

    readme_path = REPO / "README.md"
    readme = readme_path.read_text()
    new_readme, n1 = re.subn(
        r"\*\*[\d.]+ s\s*total vs [\d.]+ s\s*vanilla-PySpark baseline "
        r"\([\d.]+×\), every per-query\s*ratio ≤ [\d.]+×\*\*"
        r" \(q_\w+; next [\d.]+\),",
        headline,
        readme,
    )
    # the prose pointer naming the artifact the medians come from
    new_readme, n2 = re.subn(r"`BENCH_r\d+\.json` medians", f"`{name}` medians", new_readme)
    if n1 != 1:
        raise SystemExit(f"README headline line not found/ambiguous (n={n1})")

    survey_path = REPO / "SURVEY.md"
    survey = survey_path.read_text()
    new_survey, n3 = re.subn(
        r"driver-attested BENCH_r\d+\.json vs the protocol-2 baseline: "
        r"[\d.]+ s total = [\d.]+× vanilla, every per-query ratio "
        r"≤[\d.]+×",
        f"driver-attested {name} vs the protocol-2 baseline: "
        f"{total:.2f} s total = {agg:.2f}× vanilla, every per-query "
        f"ratio ≤{max_claim:.2f}×",
        survey,
    )
    if n3 != 1:
        raise SystemExit(f"SURVEY pinned sentence not found/ambiguous (n={n3})")

    if check:
        print("--check: no files written")
        return 0
    readme_path.write_text(new_readme)
    survey_path.write_text(new_survey)
    print(f"wrote README.md (headline + {n2} artifact pointer) and SURVEY.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
