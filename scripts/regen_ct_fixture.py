#!/usr/bin/env python
"""Regenerate the committed recorded CT-log fixture (r13 verdict #8).

The previous corpus was 10 leaves across 2 logs, all stamped
2024-01-01, CN + 1-3 plain SANs. This regenerates a larger, newer,
shape-diverse slice so the RFC 6962 parse path, PSL base-domain
extraction, and dedup see the structures live logs actually carry:

- 3 logs x 20 leaves (was 2 x 4-6);
- leaf timestamps spanning Jan 2025 - Aug 2026, monotone per log (the
  shape a real get-entries page has), cert validity windows anchored at
  the leaf timestamp;
- domain shapes: wildcards (*.example.org), multi-label public
  suffixes (.co.uk, .com.au, .com.br), punycode IDN labels (xn--),
  deep subdomains (a.b.c.d.example.com), SAN fan-outs up to 8 names,
  and UPPERCASE inputs (the parse lowercases);
- every 7th leaf repeats the previous leaf's DER byte-for-byte (same
  fingerprint — the cross-entry duplicate the dedup stage must fold).

Key generation is not seeded (EC keys are fresh per run) — the COMMITTED
fixture is the deterministic object; domains/timestamps/duplicate
structure are reproducible from this script.

Usage: python scripts/regen_ct_fixture.py [out_dir]
Default out_dir: tests/fixtures/ct_logs (the committed location).
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.ctgen import make_cert_der, wrap_leaf, write_log_dir  # noqa: E402

START = datetime.datetime(2025, 1, 15)
STEP = datetime.timedelta(days=9, hours=13)  # 20 leaves -> ~mid-2026
PER_LOG = 20
DUP_EVERY = 7

# domain-shape templates; {i} is the per-leaf uniquifier
SHAPES = [
    ["shop-{i}.example.com", "www.shop-{i}.example.com"],
    ["*.cdn-{i}.example.org", "cdn-{i}.example.org"],
    ["mail-{i}.bbc.co.uk", "webmail-{i}.bbc.co.uk", "imap-{i}.bbc.co.uk"],
    ["api-{i}.gov.com.au"],
    ["xn--bcher-{i}-kva.example", "www.xn--bcher-{i}-kva.example"],
    ["a.b.c.d.deep-{i}.example.net"],
    ["UPPER-{i}.Example.COM", "ALT-{i}.example.com"],
    [
        "fan-{i}.example.io",
        "a.fan-{i}.example.io",
        "b.fan-{i}.example.io",
        "c.fan-{i}.example.io",
        "d.fan-{i}.example.io",
        "e.fan-{i}.example.io",
        "f.fan-{i}.example.io",
        "g.fan-{i}.example.io",
    ],
    ["loja-{i}.empresa.com.br", "www.loja-{i}.empresa.com.br"],
]

LOGS = ["Google Argon2026", "Cloudflare Nimbus2026", "Lets Encrypt Oak2026"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "ct_logs",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    serial = 1000
    for li, log in enumerate(LOGS):
        leaves: list[bytes] = []
        prev: bytes | None = None
        for j in range(PER_LOG):
            ts = START + STEP * j + datetime.timedelta(hours=li * 3)
            if prev is not None and j % DUP_EVERY == DUP_EVERY - 1:
                der = prev  # byte-identical duplicate -> same fingerprint
            else:
                shape = SHAPES[(li * PER_LOG + j) % len(SHAPES)]
                domains = [d.format(i=li * PER_LOG + j) for d in shape]
                der = make_cert_der(domains, serial=serial, not_before=ts)
                serial += 1
            prev = der
            # pin the epoch conversion to UTC: .timestamp() on a naive
            # datetime uses the regenerating machine's LOCAL timezone, so
            # the committed fixture bytes would differ per-TZ (r14 advice
            # #5), contradicting the reproducibility claim above
            ts_utc = ts.replace(tzinfo=datetime.timezone.utc)
            leaves.append(wrap_leaf(der, ts_ms=int(ts_utc.timestamp() * 1000)))
        write_log_dir(out, log, leaves)
        print(f"{log}: {len(leaves)} leaves")
    print(f"-> {out}")


if __name__ == "__main__":
    main()
