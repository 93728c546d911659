"""Log-list discovery filters (reference: ct_ingestor.py:63-97)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def log_list_path(tmp_path_factory):
    doc = {
        "operators": [
            {
                "name": "Google",
                "logs": [
                    {
                        "description": "Argon 2024",
                        "url": "https://ct.example/argon2024/",
                        "state": {"usable": {"timestamp": "2023-01-01T00:00:00Z"}},
                        "temporal_interval": {
                            "start_inclusive": "2024-01-01T00:00:00Z",
                            "end_exclusive": "2025-01-01T00:00:00Z",
                        },
                    },
                    {
                        "description": "Argon 2020 (retired)",
                        "url": "https://ct.example/argon2020/",
                        "state": {"retired": {"timestamp": "2021-01-01T00:00:00Z"}},
                        "temporal_interval": {
                            "start_inclusive": "2020-01-01T00:00:00Z",
                            "end_exclusive": "2021-01-01T00:00:00Z",
                        },
                    },
                    {
                        "description": "Argon 2030 (future)",
                        "url": "https://ct.example/argon2030/",
                        "state": {"usable": {"timestamp": "2023-01-01T00:00:00Z"}},
                        "temporal_interval": {
                            "start_inclusive": "2030-01-01T00:00:00Z",
                            "end_exclusive": "2031-01-01T00:00:00Z",
                        },
                    },
                    {
                        "description": "Pending log",
                        "url": "https://ct.example/pending/",
                        "state": {"pending": {"timestamp": "2024-01-01T00:00:00Z"}},
                    },
                ],
            },
            {
                "name": "Cloudflare",
                "logs": [
                    {
                        "description": "Nimbus Frozen",
                        "url": "https://ct.example/nimbus/",
                        "state": {"frozen": {"timestamp": "2024-02-01T00:00:00Z"}},
                        # no temporal_interval: defaults open (1970..9999)
                    }
                ],
            },
        ]
    }
    p = tmp_path_factory.mktemp("loglist") / "log_list.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_discovery_filters(spark, log_list_path):
    from ct_clickhouse_spark.sources.log_list import discover_logs

    rows = discover_logs(spark, log_list_path, "2024-06-15 00:00:00").collect()
    got = {(r.operator, r.name, r.state) for r in rows}
    # retired, future-interval, and pending logs are all excluded;
    # missing interval defaults open
    assert got == {
        ("Google", "Argon 2024", "usable"),
        ("Cloudflare", "Nimbus Frozen", "frozen"),
    }
    # trailing slash stripped (ct_ingestor.py:94 parity)
    assert all(not r.url.endswith("/") for r in rows)


def test_discovery_respects_now(spark, log_list_path):
    from ct_clickhouse_spark.sources.log_list import discover_logs

    rows = discover_logs(spark, log_list_path, "2030-06-15 00:00:00").collect()
    names = {r.name for r in rows}
    assert "Argon 2030 (future)" in names
    assert "Argon 2024" not in names  # its interval has ended
