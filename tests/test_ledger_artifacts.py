"""Evidence-integrity gate (r12 verdict #8): every benchmark /
correctness / recall artifact filename cited in the SURVEY.md ledger or
BASELINE.md must exist on disk. Round 11 and round 12 each shipped one
citation to an artifact that was never recorded (the drain / drain10x
streaming runs); this gate makes that failure mode a red test instead of
a judge finding."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# artifact-shaped tokens: the families the round driver and the repo's
# bench/certify scripts emit at the repo root
_PATTERN = re.compile(
    r"\b((?:BENCH|CORRECTNESS|ANN|PROFILE|COPYCHECK|LEAKCHECK|MATCHED)"
    r"_[A-Za-z0-9_.]*?\.json)\b"
)

# artifacts a ledger may legitimately name before they exist: the CURRENT
# round's driver-emitted files land only when the round ends (the driver
# itself writes BENCH_r{N}.json / CORRECTNESS_r{N}.json after the turn
# budget, so a SURVEY line updated mid-round may reference them)
_DRIVER_EMITTED = re.compile(r"^(BENCH|CORRECTNESS)_r\d+\.json$")


def _cited(path: str) -> set[str]:
    with open(path, encoding="utf-8") as f:
        return set(_PATTERN.findall(f.read()))


def test_every_cited_artifact_exists():
    missing = []
    for ledger in ("SURVEY.md", "BASELINE.md", "SCALING.md"):
        for name in sorted(_cited(os.path.join(REPO, ledger))):
            if _DRIVER_EMITTED.match(name):
                continue
            if not os.path.exists(os.path.join(REPO, name)):
                missing.append(f"{ledger} cites {name}")
    assert not missing, (
        "ledger cites artifacts that do not exist on disk "
        "(record the run or strike the citation): " + "; ".join(missing)
    )


# ---------------------------------------------------------------------------
# Content freshness (r13 verdict #7): existence alone could not catch the
# r13 drift where the committed certification said n_ok=49 while the
# ledger claimed 50/50. Parse the few quoted figures next to an artifact
# citation and compare them to the artifact's JSON, so mutating an
# artifact's n_ok (or re-certifying) without editing the ledger turns a
# test red.

_LEDGERS = ("SURVEY.md", "BASELINE.md", "SCALING.md")

# "NN/MM" on the same line as a CORRECTNESS_*.json citation, where MM
# equals the artifact's slot census, must equal its n_ok
_NOFM = re.compile(r"\b(\d+)/(\d+)\b")
_CORR_CITE = re.compile(r"\b(CORRECTNESS_sf10_[A-Za-z0-9_.]*?\.json)\b")
# the matched-table headline sentence shapes used in BASELINE.md
_MATCHED_CITE = re.compile(r"\b(BENCH_matched_[A-Za-z0-9_.]*?\.json)\b")
_MATCHED_TRIPLE = re.compile(
    r"([\d.]+) s(?: Spark)? vs ([\d.]+) s(?: DuckDB)? = ([\d.]+)x"
)


def _paragraphs(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    return [" ".join(p.split()) for p in text.split("\n\n")]


def _load(name: str) -> dict | None:
    import json

    p = os.path.join(REPO, name)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def test_quoted_n_ok_matches_artifact():
    stale = []
    for ledger in _LEDGERS:
        with open(os.path.join(REPO, ledger), encoding="utf-8") as f:
            for ln, line in enumerate(f, 1):
                arts = _CORR_CITE.findall(line)
                if not arts:
                    continue
                for art in set(arts):
                    data = _load(art)
                    if data is None or "n_slots" not in data:
                        continue
                    for nn, mm in _NOFM.findall(line):
                        if int(mm) == int(data["n_slots"]) and int(nn) != int(
                            data["n_ok"]
                        ):
                            stale.append(
                                f"{ledger}:{ln} claims {nn}/{mm} for {art} "
                                f"(artifact n_ok={data['n_ok']})"
                            )
    assert not stale, "ledger quotes stale n_ok figures: " + "; ".join(stale)


def test_quoted_matched_headline_matches_artifact():
    stale = []
    for ledger in _LEDGERS:
        paras = _paragraphs(os.path.join(REPO, ledger))
        for i, para in enumerate(paras):
            arts = set(_MATCHED_CITE.findall(para))
            if not arts:
                # a headline paragraph may sit just under its citation
                # paragraph — attribute it to the nearest citation within
                # the two preceding paragraphs
                for back in paras[max(0, i - 2) : i][::-1]:
                    prev = set(_MATCHED_CITE.findall(back))
                    if prev:
                        arts = prev
                        break
            if len(arts) != 1:
                continue  # zero or ambiguous citation: nothing checkable
            data = _load(next(iter(arts)))
            if data is None or "ratio_all" not in data:
                continue
            legal = {
                (
                    round(data["spark_sec_total"], 1),
                    round(data["duckdb_sec_total"], 1),
                    round(data["ratio_all"], 2),
                ),
                (
                    round(data["spark_sec_core"], 1),
                    round(data["duckdb_sec_core"], 1),
                    round(data["ratio_core"], 2),
                ),
            }
            for s, o, r in _MATCHED_TRIPLE.findall(para):
                trip = (round(float(s), 1), round(float(o), 1), round(float(r), 2))
                if trip not in legal:
                    stale.append(
                        f"{ledger} quotes {trip} against {next(iter(arts))} "
                        f"(artifact totals {sorted(legal)})"
                    )
    assert not stale, (
        "ledger quotes stale matched-table headline figures: "
        + "; ".join(stale)
    )


# ---------------------------------------------------------------------------
# Silent-artifact gate (r14 verdict #5): the r14 sf30 certification sat
# on disk cited in NO ledger, so the freshness checks above never looked
# at it — silence evaded the gate. Two closures:
#  1. every scale-certification artifact on disk must be cited in at
#     least one ledger (the driver-emitted per-round CORRECTNESS_r{N}
#     files are exempt — the driver writes them, not the ledgers);
#  2. the NEWEST certification per scale factor must be fully green
#     (n_ok == n_slots) — leaving a failing artifact newest (as the
#     pre-fix 3/4 sf30 run briefly was) turns a test red instead of
#     waiting for a judge to notice.

_CERT_ON_DISK = re.compile(r"^CORRECTNESS_(sf[\d.]+|multiproc)[A-Za-z0-9_.]*\.json$")
_CERT_SF = re.compile(r"^CORRECTNESS_(sf[\d.]+)")


def test_every_certification_artifact_on_disk_is_cited():
    cited: set[str] = set()
    for ledger in _LEDGERS:
        cited |= _cited(os.path.join(REPO, ledger))
    silent = [
        name
        for name in sorted(os.listdir(REPO))
        if _CERT_ON_DISK.match(name) and name not in cited
    ]
    assert not silent, (
        "certification artifacts on disk are cited in no ledger "
        "(write them up or remove them): " + "; ".join(silent)
    )


def test_newest_certification_per_sf_is_fully_green():
    by_sf: dict[str, list[tuple[str, str, dict]]] = {}
    for name in sorted(os.listdir(REPO)):
        m = _CERT_SF.match(name)
        if not m:
            continue
        data = _load(name)
        if not isinstance(data, dict) or "n_slots" not in data:
            continue  # legacy shapes without a census are not rankable
        stamp = data.get("generated_utc") or ""
        if not stamp:
            # legacy artifacts without a content stamp: fall back to
            # mtime so they still participate in newest-wins ordering
            stamp = str(os.path.getmtime(os.path.join(REPO, name)))
        by_sf.setdefault(m.group(1), []).append((stamp, name, data))
    bad = []
    for sf, rows in by_sf.items():
        stamp, name, data = max(rows)
        if int(data["n_ok"]) != int(data["n_slots"]):
            bad.append(
                f"{sf}: newest certification {name} has "
                f"n_ok={data['n_ok']} of n_slots={data['n_slots']}"
            )
    assert not bad, (
        "newest certification per scale factor is not fully green: "
        + "; ".join(bad)
    )
