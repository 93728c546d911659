"""The composed product path (r4 verdict #9): streaming ingest from a
fixture CT-log HTTP server -> watermark dedup -> partitioned parquet
table -> Flask /stream SSE tail serving the rows — including a log
GROWTH picked up by a checkpoint-resumed ingest and served as NEW tail
rows. Every piece is tested in isolation elsewhere; this is the
reference's whole product (docker-compose.yml:1-79) in one flow."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from tests.ctgen import make_cert_der, wrap_leaf, write_log_dir
from tests.test_http_transport import _CTHandler

LOG_NAME = "E2e Flow Log"
N_FIRST = 5
N_GROWTH = 3


class _E2eHandler(_CTHandler):
    """Subclass isolates class-attribute state from the transport tests."""

    recorded = None
    log_name = LOG_NAME
    clamp = 100  # no server-side paging games here
    fail_next = False
    requests_seen: list[str] = []


@pytest.fixture(scope="module")
def e2e_env(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("e2e_logs"))
    leaves = [
        wrap_leaf(make_cert_der([f"first{i}.example.org"], i + 1))
        for i in range(N_FIRST)
    ]
    write_log_dir(base, LOG_NAME, leaves, tree_size=N_FIRST)
    _E2eHandler.recorded = base
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _E2eHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield base, leaves, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _sse_domains(client, max_polls: int = 1) -> list[str]:
    resp = client.get(f"/stream?poll=0&max_polls={max_polls}")
    return [
        json.loads(line[len("data: ") :])["domain"]
        for line in resp.data.decode().splitlines()
        if line.startswith("data: ")
    ]


def test_http_ingest_to_sse_tail_end_to_end(spark, e2e_env, tmp_path):
    from ct_clickhouse_spark.serving.app import create_app
    from ct_clickhouse_spark.streaming.ingest import start_ingest

    base, leaves, url = e2e_env
    table = str(tmp_path / "cert_domains")
    ckpt = str(tmp_path / "ckpt")
    urls = f"{LOG_NAME}={url}"

    # 1. ingest the frozen log over HTTP (availableNow = one trigger
    #    interval drains everything the STH publishes)
    q = start_ingest(spark, None, table, ckpt, available_now=True, urls=urls)
    q.awaitTermination(120)

    app = create_app(spark, table)
    app.config["TESTING"] = True
    client = app.test_client()

    got = _sse_domains(client)
    assert sorted(got) == sorted(f"first{i}.example.org" for i in range(N_FIRST))

    # 2. the log GROWS: 3 new certs + an exact replay of leaf 0 (the
    #    at-least-once duplicate the watermark dedup must swallow)
    growth = [
        wrap_leaf(make_cert_der([f"grown{i}.example.org"], 100 + i))
        for i in range(N_GROWTH)
    ]
    write_log_dir(
        base,
        LOG_NAME,
        leaves + growth + [leaves[0]],
        tree_size=N_FIRST + N_GROWTH + 1,
    )

    # 3. checkpoint-resumed ingest picks up ONLY the new entries
    q2 = start_ingest(spark, None, table, ckpt, available_now=True, urls=urls)
    q2.awaitTermination(120)

    # 4. the tail now serves old + new rows; the replayed duplicate of
    #    first0 appears exactly once
    got2 = _sse_domains(client)
    expected = sorted(
        [f"first{i}.example.org" for i in range(N_FIRST)]
        + [f"grown{i}.example.org" for i in range(N_GROWTH)]
    )
    assert sorted(got2) == expected  # no duplicate row, nothing dropped

    # 5. keyset tail: a second poll after the boundary serves ONLY rows
    #    past the already-seen key, i.e. the stream never re-sends
    two_polls = _sse_domains(client, max_polls=2)
    assert sorted(two_polls) == expected  # page 2 is empty — no resend
