"""HTTP transport seam for the ct_log source (reference
ct_ingestor.py:100-110): get-sth / get-entries over HTTP against a local
fixture server, including server-side batch clamping and error paths, plus
registry-eligibility wiring into live discovery."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from tests.ctgen import make_cert_der, wrap_leaf, write_log_dir

N_LEAVES = 7


@pytest.fixture(scope="module")
def recorded_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("http_logs"))
    leaves = [
        wrap_leaf(make_cert_der([f"d{i}.example.com"], i + 1)) for i in range(N_LEAVES)
    ]
    write_log_dir(base, "Http Test Log", leaves, tree_size=N_LEAVES)
    return base


class _CTHandler(http.server.BaseHTTPRequestHandler):
    """Serves the recorded dir over the RFC 6962 wire endpoints.
    clamp: max entries returned per get-entries call (server-side paging).
    fail_next: one-shot 500 to exercise the error path."""

    recorded = None
    log_name = "Http Test Log"
    clamp = 2
    fail_next = False
    requests_seen: list[str] = []

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        cls = type(self)
        cls.requests_seen.append(self.path)
        if cls.fail_next:
            cls.fail_next = False
            self.send_response(500)
            self.end_headers()
            return
        import os
        import urllib.parse

        if self.path.endswith("/ct/v1/get-sth"):
            with open(os.path.join(cls.recorded, cls.log_name, "sth.json")) as f:
                body = f.read().encode()
        elif "/ct/v1/get-entries" in self.path:
            q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            start, end = int(q["start"][0]), int(q["end"][0])  # inclusive end
            end = min(end, start + cls.clamp - 1)  # server-side clamp
            entries = []
            with open(os.path.join(cls.recorded, cls.log_name, "entries.jsonl")) as f:
                for idx, line in enumerate(f):
                    if start <= idx <= end:
                        entries.append({"leaf_input": json.loads(line)["leaf_input"]})
            body = json.dumps({"entries": entries}).encode()
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def ct_server(recorded_dir):
    _CTHandler.recorded = recorded_dir
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CTHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_transport_matches_dir_transport(ct_server, recorded_dir):
    from ct_clickhouse_spark.sources.ct_log import DirTransport, HttpTransport

    http_t = HttpTransport({"Http Test Log": ct_server})
    dir_t = DirTransport(recorded_dir)
    assert http_t.list_logs() == ["Http Test Log"]
    assert http_t.fetch_sth("Http Test Log") == dir_t.fetch_sth("Http Test Log")
    # clamped server: one call returns at most `clamp` entries
    got = http_t.fetch_entries("Http Test Log", 0, N_LEAVES)
    assert len(got) == _CTHandler.clamp
    assert got == dir_t.fetch_entries("Http Test Log", 0, _CTHandler.clamp)


def test_http_read_loops_over_server_clamping(ct_server, recorded_dir):
    """read() must cover [start, end) even when every response is clamped
    to 2 entries — the reference advances by len(entries) the same way."""
    from ct_clickhouse_spark.sources.ct_log import (
        CTLogPartition,
        CTLogStreamReader,
        DirTransport,
    )

    reader = CTLogStreamReader({"urls": f"Http Test Log={ct_server}"})
    part = CTLogPartition(reader.transport, "Http Test Log", 0, N_LEAVES)
    rows = list(reader.read(part))
    assert [r[1] for r in rows] == list(range(N_LEAVES))
    expected = DirTransport(recorded_dir).fetch_entries("Http Test Log", 0, N_LEAVES)
    assert [r[2] for r in rows] == expected


def test_http_offsets_come_from_get_sth(ct_server):
    from ct_clickhouse_spark.sources.ct_log import CTLogStreamReader

    reader = CTLogStreamReader({"urls": f"Http Test Log={ct_server}"})
    assert reader.initialOffset() == {"Http Test Log": 0}
    assert reader.latestOffset() == {"Http Test Log": N_LEAVES}


def test_http_error_surfaces(ct_server):
    from ct_clickhouse_spark.sources.ct_log import HttpTransport

    _CTHandler.fail_next = True
    t = HttpTransport({"Http Test Log": ct_server})
    with pytest.raises(Exception):
        t.fetch_sth("Http Test Log")
    # next call succeeds (Spark task retry semantics: fail fast, retry clean)
    assert t.fetch_sth("Http Test Log") == N_LEAVES


def test_bad_urls_option_rejected():
    from ct_clickhouse_spark.sources.ct_log import CTLogStreamReader

    with pytest.raises(ValueError, match="urls"):
        CTLogStreamReader({"urls": "no-equals-sign"})
    with pytest.raises(ValueError, match="path"):
        CTLogStreamReader({})


def test_streaming_query_end_to_end_over_http(spark, ct_server):
    """A full availableNow streaming read through the HTTP transport: the
    same rows a recorded-dir read produces, fetched over the wire with
    server-side clamping active."""
    from ct_clickhouse_spark.sources.ct_log import register

    register(spark)
    q = (
        spark.readStream.format("ct_log")
        .option("urls", f"Http Test Log={ct_server}")
        .load()
        .writeStream.format("memory")
        .queryName("http_e2e")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM http_e2e ORDER BY entry_index").collect()
    assert [r.entry_index for r in rows] == list(range(N_LEAVES))
    assert all(r.log_name == "Http Test Log" for r in rows)


@pytest.fixture()
def registry(tmp_path, recorded_dir):
    """A registry where the recorded log is eligible and a second recorded
    log is retired."""
    leaves = [wrap_leaf(make_cert_der(["retired.example.com"], 99))]
    write_log_dir(recorded_dir, "Retired Log", leaves, tree_size=1)
    doc = {
        "operators": [
            {
                "name": "Test",
                "logs": [
                    {
                        "description": "Http Test Log",
                        "url": "https://ct.example/a/",
                        "state": {"usable": {"timestamp": "2024-01-01T00:00:00Z"}},
                    },
                    {
                        "description": "Retired Log",
                        "url": "https://ct.example/b/",
                        "state": {"retired": {"timestamp": "2024-01-01T00:00:00Z"}},
                    },
                ],
            }
        ]
    }
    p = tmp_path / "log_list.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_registry_filters_live_discovery(recorded_dir, registry):
    """A retired log present on disk must not be ingested when a registry
    is given: neither initialOffset nor latestOffset may list it."""
    from ct_clickhouse_spark.sources.ct_log import CTLogStreamReader

    reader = CTLogStreamReader(
        {"path": recorded_dir, "registry": registry, "now": "2024-06-15T00:00:00Z"}
    )
    assert set(reader.initialOffset()) == {"Http Test Log"}
    assert set(reader.latestOffset()) == {"Http Test Log"}
    # without the registry, the retired dir would be discovered
    bare = CTLogStreamReader({"path": recorded_dir})
    assert "Retired Log" in set(bare.initialOffset())


def test_registry_ttl_refresh(recorded_dir, registry):
    """TTL semantics of the registry document (reference: 24 h log-list
    cache): with registryttlsec=0 an on-disk registry update is honored
    at the very next offset poll (the newly-retired log drops out); with
    a large TTL the cached document keeps serving."""
    from ct_clickhouse_spark.sources.ct_log import CTLogStreamReader

    def retire_http_test_log():
        doc = json.loads(open(registry).read())
        doc["operators"][0]["logs"][0]["state"] = {
            "retired": {"timestamp": "2024-06-01T00:00:00Z"}
        }
        with open(registry, "w") as f:
            json.dump(doc, f)

    fresh = CTLogStreamReader(
        {
            "path": recorded_dir,
            "registry": registry,
            "now": "2024-06-15T00:00:00Z",
            "registryttlsec": "0",
        }
    )
    assert set(fresh.latestOffset()) == {"Http Test Log"}
    cached = CTLogStreamReader(
        {
            "path": recorded_dir,
            "registry": registry,
            "now": "2024-06-15T00:00:00Z",
            "registryttlsec": "3600",
        }
    )
    assert set(cached.latestOffset()) == {"Http Test Log"}
    retire_http_test_log()
    # ttl=0: next poll re-reads the document and drops the log
    assert set(fresh.latestOffset()) == set()
    # ttl=1h: the stale cache keeps serving until the TTL lapses
    assert set(cached.latestOffset()) == {"Http Test Log"}


def test_eligible_log_names_matches_dataframe_discovery(spark, tmp_path):
    """The stdlib eligibility rules and the DataFrame discover_logs must
    agree on the same registry document."""
    from ct_clickhouse_spark.sources.log_list import discover_logs, eligible_log_names

    doc = {
        "operators": [
            {
                "name": "Op",
                "logs": [
                    {
                        "description": "Good",
                        "url": "https://x/",
                        "state": {"usable": {"timestamp": "2024-01-01T00:00:00Z"}},
                        "temporal_interval": {
                            "start_inclusive": "2024-01-01T00:00:00Z",
                            "end_exclusive": "2025-01-01T00:00:00Z",
                        },
                    },
                    {
                        "description": "Gone",
                        "url": "https://y/",
                        "state": {"retired": {"timestamp": "2023-01-01T00:00:00Z"}},
                    },
                    {
                        "description": "Future",
                        "url": "https://z/",
                        "state": {"usable": {"timestamp": "2024-01-01T00:00:00Z"}},
                        "temporal_interval": {
                            "start_inclusive": "2030-01-01T00:00:00Z",
                            "end_exclusive": "2031-01-01T00:00:00Z",
                        },
                    },
                    {
                        "description": "Frozen open-interval",
                        "url": "https://w/",
                        "state": {"frozen": {"timestamp": "2024-02-01T00:00:00Z"}},
                    },
                ],
            }
        ]
    }
    p = tmp_path / "ll.json"
    p.write_text(json.dumps(doc))
    now = "2024-06-15T00:00:00Z"
    names = eligible_log_names(str(p), now)
    df_names = {r.name for r in discover_logs(spark, str(p), "2024-06-15 00:00:00").collect()}
    assert names == df_names == {"Good", "Frozen open-interval"}
