"""HTTP transport test: in-process ThreadingHTTPServer over the engine,
driven with urllib — route shapes mirror the reference's Flask app
(/root/reference/mcp_server/http_server.py:43-68). Served payloads must
equal engine-direct results, and both transports (HTTP here, stdio in
test_serving_stdio) share the same dispatch layer."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

QUERY = "patience and prayer"


@pytest.fixture(scope="module")
def served(spark, sf_dir):
    from hadith_vector_search_spark.api import HybridEngine
    from hadith_vector_search_spark.serving.http import EngineHTTPServer
    from hadith_vector_search_spark.sources import load_table

    engine = HybridEngine(spark, load_table(spark, sf_dir, "documents"))
    server = EngineHTTPServer(engine).start()
    yield server, engine
    server.stop()


def _get(server, path):
    with urllib.request.urlopen(
            f"http://{server.host}:{server.port}{path}", timeout=120) as r:
        return json.loads(r.read())


def _post(server, path, payload):
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_http_routes_match_engine_direct(served):
    server, engine = served

    assert _get(server, "/health") == {"ok": True}

    direct_status = [r.asDict() for r in engine.status().collect()]
    assert _get(server, "/api/status") == direct_status

    served_rows = _post(server, "/api/search/hybrid",
                        {"query": QUERY, "n_results": 5})
    direct = [r.asDict() for r in
              engine.hybrid_search(QUERY, n_results=5).collect()]
    assert [r["doc_id"] for r in served_rows] == [r["doc_id"] for r in direct]
    for s, d in zip(served_rows, direct):
        assert s["score"] == pytest.approx(d["score"])

    doc = _get(server, f"/api/document/{served_rows[0]['doc_id']}")
    assert doc["doc_id"] == served_rows[0]["doc_id"]

    fts = _post(server, "/api/match/fts", {"terms": ["patience"], "limit": 5})
    assert isinstance(fts, list)


def test_http_error_paths(served):
    server, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/search/hybrid", {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/document/999999999")
    assert e.value.code == 404


def test_http_body_size_cap(served):
    """Client-controlled Content-Length beyond MAX_BODY_BYTES → 413, and
    the server must not read the oversized body into memory."""
    from hadith_vector_search_spark.serving.http import MAX_BODY_BYTES

    server, _ = served
    big = b'{"query": "' + b"x" * MAX_BODY_BYTES + b'"}'
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/api/search/hybrid",
        data=big, headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 413


def test_https_round_trip(spark, sf_dir, tmp_path):
    """TLS transport (ref mcp_server/http_server.py:78-80 serves Flask over
    a cert pair): self-signed cert, HTTPS health + hybrid search round-trip.
    Skips when the openssl CLI is unavailable."""
    import shutil
    import ssl
    import subprocess

    if shutil.which("openssl") is None:
        pytest.skip("openssl CLI not available to mint a test cert")

    cert, key = str(tmp_path / "crt.pem"), str(tmp_path / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True)

    from hadith_vector_search_spark.api import HybridEngine
    from hadith_vector_search_spark.serving.http import EngineHTTPServer
    from hadith_vector_search_spark.sources import load_table

    engine = HybridEngine(spark, load_table(spark, sf_dir, "documents"))
    server = EngineHTTPServer(engine, tls_cert=cert, tls_key=key).start()
    try:
        ctx = ssl.create_default_context(cafile=cert)
        ctx.check_hostname = False  # self-signed test cert, CN only
        url = f"https://{server.host}:{server.port}"
        with urllib.request.urlopen(f"{url}/health", timeout=60,
                                    context=ctx) as r:
            assert json.loads(r.read()) == {"ok": True}
        req = urllib.request.Request(
            f"{url}/api/search/hybrid",
            data=json.dumps({"query": QUERY, "n_results": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300, context=ctx) as r:
            rows = json.loads(r.read())
        assert rows and all("doc_id" in r for r in rows)
    finally:
        server.stop()


def test_http_split_status_routes(served):
    """GET /api/status/vector and /api/status/fts mirror the reference's
    split status endpoints (tools.py:14-37)."""
    server, _engine = served
    for path, key in [("/api/status/vector", "n_vectors"),
                      ("/api/status/fts", "n_docs")]:
        rows = _get(server, path)
        assert rows and key in rows[0], (path, rows)


def test_http_more_like_this_route(served):
    server, engine = served
    seed = [r.asDict() for r in engine.more_like_this(0, n_results=5).collect()]
    rows = _post(server, "/api/search/more_like_this",
                 {"doc_id": 0, "n_results": 5})
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in seed]
    assert all(r["doc_id"] != 0 for r in rows)       # seed excluded
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/search/more_like_this", {})
    assert e.value.code == 400


def test_http_rerank_route(served):
    server, engine = served
    direct = [r.asDict() for r in
              engine.rerank_search(QUERY, n_results=5).collect()]
    rows = _post(server, "/api/search/rerank", {"query": QUERY, "n_results": 5})
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in direct]
    assert all("ce_score" in r for r in rows)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/search/rerank", {})
    assert e.value.code == 400


def test_http_hybrid_batch_route(served):
    server, engine = served
    payload = {"queries": [QUERY, "hadith 3"], "n_results": 3}
    rows = _post(server, "/api/search/hybrid_batch", payload)
    assert isinstance(rows, list) and rows
    direct = [r.asDict() for r in engine.hybrid_search_batch(
        [QUERY, "hadith 3"], n_results=3).collect()]
    assert [(r["query_idx"], r["doc_id"]) for r in rows] == \
        [(r["query_idx"], r["doc_id"]) for r in direct]
    for s, d in zip(rows, direct):
        assert s["score"] == pytest.approx(d["score"])
    assert all("explanation" in r for r in rows)

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server, "/api/search/hybrid_batch", {})
    assert exc.value.code == 400
