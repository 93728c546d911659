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
