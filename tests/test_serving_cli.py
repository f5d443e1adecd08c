"""CLI surface test: one-shot and REPL modes run against an in-process
engine (passing `engine=` skips session construction, so the test session
is reused); outputs must match engine-direct results."""

from __future__ import annotations

import io
import json

import pytest


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    from hadith_vector_search_spark.api import HybridEngine
    from hadith_vector_search_spark.sources import load_table

    return HybridEngine(spark, load_table(spark, sf_dir, "documents"))


def test_one_shot_hybrid_json(engine):
    from hadith_vector_search_spark.serving.cli import run

    out = io.StringIO()
    rc = run(["patience and prayer", "-k", "3", "--json"], engine=engine,
             stdout=out)
    assert rc == 0
    rows = json.loads(out.getvalue())
    direct = [r.asDict() for r in
              engine.hybrid_search("patience and prayer", n_results=3).collect()]
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in direct]


def test_one_shot_fts_terms(engine):
    from hadith_vector_search_spark.serving.cli import run

    out = io.StringIO()
    rc = run(["--terms", "patience", "-k", "3", "--json"], engine=engine,
             stdout=out)
    assert rc == 0
    rows = json.loads(out.getvalue())
    direct = [r.asDict() for r in
              engine.fts_match(terms=["patience"], k=3).collect()]
    assert rows == pytest.approx(direct) if not rows else \
        [r["doc_id"] for r in rows] == [r["doc_id"] for r in direct]


def test_repl_two_queries_one_engine(engine):
    from hadith_vector_search_spark.serving.cli import run

    stdin = io.StringIO("patience\n:match charity\n:quit\n")
    out = io.StringIO()
    rc = run(["--json"], engine=engine, stdin=stdin, stdout=out)
    assert rc == 0
    # three prompts (initial + after each command) and two JSON result lines
    text = out.getvalue()
    assert text.count("query>") == 3
    payloads = [json.loads(line) for line in text.replace("query>", "").splitlines()
                if line.strip()]
    assert len(payloads) == 2


def test_cli_status_flags(spark, sf_dir):
    """--status {corpus,vector,fts} one-shots and the ':status' REPL
    command print status rows."""
    import io
    import json as _json

    from hadith_vector_search_spark.api import HybridEngine
    from hadith_vector_search_spark.serving.cli import run
    from hadith_vector_search_spark.sources import load_table

    eng = HybridEngine(spark, load_table(spark, sf_dir, "documents"))
    out = io.StringIO()
    assert run(["--status", "fts", "--json"], engine=eng, stdout=out) == 0
    row = _json.loads(out.getvalue())[0]
    assert row["built"] is False

    eng.index  # build the lexical pin
    out = io.StringIO()
    assert run(["--status", "fts", "--json"], engine=eng, stdout=out) == 0
    row = _json.loads(out.getvalue())[0]
    assert row["built"] is True and row["n_docs"] > 0

    out = io.StringIO()
    rc = run(["--json"], engine=eng,
             stdin=io.StringIO(":status vector\n:quit\n"), stdout=out)
    assert rc == 0
    payload = out.getvalue().split("query> ")[1]
    assert "n_vectors" in payload
