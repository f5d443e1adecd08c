"""Lake-layout machinery: partition pruning and bucketed co-located joins,
asserted from the physical plan (not assumed)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadith_vector_search_spark.sources import load_table
from hadith_vector_search_spark.sources.layout import (
    partition_filters,
    scan_exchanges,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, "lang")
    # layout on disk: one directory per lang
    dirs = {d for d in os.listdir(path) if d.startswith("lang=")}
    assert len(dirs) >= 2

    pruned = spark.read.parquet(path).filter(F.col("lang") == "en")
    pf = partition_filters(pruned)
    assert pf and any("lang" in f for f in pf), pf
    # pruned scan reads only the en partition's rows
    n_en = docs.filter(F.col("lang") == "en").count()
    assert pruned.count() == n_en


def test_dynamic_overwrite_touches_only_written_partitions(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_dyn")
    write_partitioned(docs, path, "lang")
    before = {d: os.listdir(os.path.join(path, d))
              for d in os.listdir(path) if d.startswith("lang=")}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        en_only = docs.filter(F.col("lang") == "en").withColumn(
            "text", F.concat(F.col("text"), F.lit(" [v2]")))
        write_partitioned(en_only, path, "lang")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    after = {d: os.listdir(os.path.join(path, d))
             for d in os.listdir(path) if d.startswith("lang=")}
    assert set(after) == set(before)  # no partition dropped
    assert after["lang=en"] != before["lang=en"]  # rewritten
    for d in before:
        if d != "lang=en":
            assert after[d] == before[d], f"untouched partition {d} modified"
    # and the data reflects the merge
    merged = spark.read.parquet(path)
    assert merged.filter(F.col("text").endswith(" [v2]")).count() == \
        merged.filter(F.col("lang") == "en").count()


def test_bucketed_join_skips_exchange(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source")
    emb_ids = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label")
    try:
        write_bucketed(docs, "t_docs_b", str(tmp_path / "docs_b"),
                       "doc_id", 4, sort_col="doc_id")
        write_bucketed(emb_ids, "t_emb_b", str(tmp_path / "emb_b"),
                       "doc_id", 4, sort_col="doc_id")
        a = spark.table("t_docs_b")
        b = spark.table("t_emb_b")
        # disable auto-broadcast so the join shape under test is the
        # sort-merge join a large-scale run would use
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "doc_id")
            # both sides pre-distributed on the key: no shuffle in the plan
            assert scan_exchanges(joined) == 0, "bucketed join still shuffles"
            # versus the plain-parquet join, which must exchange both sides
            plain = (load_table(spark, sf_dir, "documents")
                     .select("doc_id", "lang", "source")
                     .join(emb_ids, "doc_id"))
            assert scan_exchanges(plain) >= 2
            # same result either way
            assert joined.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_emb_b")


def test_bucketed_agg_skips_exchange(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    try:
        write_bucketed(docs, "t_docs_agg", str(tmp_path / "docs_agg"),
                       "doc_id", 4)
        agg = (spark.table("t_docs_agg")
               .groupBy("doc_id").agg(F.sum("n_chars").alias("s")))
        assert scan_exchanges(agg) == 0, "bucketed agg still shuffles"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_agg")


def test_bucketed_window_index_span_dedup_single_shuffle(spark, sf_dir, tmp_path):
    """The 'on a lake this is a persisted table' claim, made concrete: the
    substring-dedup window index persisted as a parquet table bucketed by
    its join/agg hash key runs the WHOLE span-dedup pipeline with exactly
    ONE hash exchange (the per-doc island merge) — the duplicate-key
    aggregate and the position-marking join read co-located buckets, and
    the final per-doc rollup reuses the island window's partitioning."""
    from hadith_vector_search_spark.operators.dedup import (
        duplicated_spans, window_index)

    docs = load_table(spark, sf_dir, "documents")
    wins = window_index(docs)
    try:
        write_bucketed(wins, "t_wins_b", str(tmp_path / "wins_b"),
                       ["_h1", "_h2"], 4)
        bucketed = spark.table("t_wins_b")
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            spans_b = duplicated_spans(docs, windows=bucketed)
            n_b = scan_exchanges(spans_b)
            spans_p = duplicated_spans(docs, windows=wins)
            n_p = scan_exchanges(spans_p)
            assert n_b == 1, f"bucketed span dedup shuffles {n_b}x"
            assert n_p > n_b, (n_p, n_b)
            key = lambda r: (r.doc_id, r.span_start)  # noqa: E731
            assert sorted(map(key, spans_b.collect())) == \
                sorted(map(key, spans_p.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_wins_b")


def test_bucketed_postings_term_lookup_prunes_buckets(spark, sf_dir, tmp_path):
    """The serving-side FTS scale lever: postings persisted bucketed by
    `term` let a query's term-list lookup scan ONLY the buckets its terms
    hash to (SelectedBucketsCount in the scan), instead of the whole
    postings table — the on-lake analogue of an FTS term index."""
    from hadith_vector_search_spark.operators.bm25 import build_index

    docs = load_table(spark, sf_dir, "documents")
    idx = build_index(docs)
    auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        # DisableUnnecessaryBucketedScan treats a pruning-only scan (no
        # downstream join/agg needing the distribution) as "unnecessary"
        # and silently disables the bucketed read — for a point-lookup
        # serving path the pruning IS the point, so pin it on.
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        write_bucketed(idx.postings, "t_postings_b",
                       str(tmp_path / "postings_b"), "term", 8)
        b = spark.table("t_postings_b")
        probe = b.filter(F.col("term").isin("spark", "query"))
        plan = probe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        sel = [ln.strip() for ln in plan.splitlines()
               if "SelectedBucketsCount" in ln]
        assert sel, "no bucket pruning in plan:\n" + plan
        import re as _re
        m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", sel[0])
        assert m and int(m.group(1)) < int(m.group(2)), sel[0]
        # pruned scan returns the same rows as the full filter
        full = idx.postings.filter(F.col("term").isin("spark", "query"))
        assert probe.count() == full.count()
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", auto)
        spark.sql("DROP TABLE IF EXISTS t_postings_b")


def test_plan_shape_invariant_across_scale_factors(spark):
    """The 100x-scale-up question asked directly of the plans: for a
    representative query from each family, the number of shuffle
    exchanges must be IDENTICAL at sf0.001 and sf0.01 — cost grows with
    data, plan shape must not (no data-dependent shuffle insertion
    outside AQE's runtime coalescing, which rewrites partition counts,
    not exchange counts)."""
    from hadith_vector_search_spark.registry import get_queries

    queries = get_queries()
    sample = ["pricing_summary", "revenue_by_region", "near_dup_minhash",
              "duplicated_span_report", "similar_pairs", "bm25_topk",
              "lm_perplexity_scores", "doc_dup_fraction",
              "cleaning_decisions", "decontamination_spans",
              "winnowed_fingerprints", "chunk_preview",
              "table_profile", "user_sessions_batch",
              "greedy_pack_assignments", "rolling_event_rate",
              "hybrid_search_rrf", "near_dup_incremental",
              "domain_kl_divergence", "retention_cohorts"]
    import os as _os

    # generated sf1 (scripts/gen_testdata.py, 1000x the smallest SF)
    # joins the invariance sweep when present — the slope study's
    # companion assertion: measured cost grows, plan shape must not.
    dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    sf1 = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".testdata", "sf1")
    if _os.path.isdir(sf1):
        dirs.append(sf1)
    for name in sample:
        shapes = {}
        for sf in dirs:
            df = queries[name](spark, sf)
            shapes[sf] = scan_exchanges(df)
        assert len(set(shapes.values())) == 1, (name, shapes)


def test_bucketed_band_index_probe_prunes_buckets(spark, sf_dir, tmp_path):
    """The incremental near-dup scale lever: the EXISTING corpus's band
    index persisted bucketed by band_key makes an incoming batch's probe
    (`lsh_band_join`'s old side) a bucket-pruned read — the on-lake
    analogue of probing an LSH hash table instead of scanning it."""
    from hadith_vector_search_spark.operators import dedup as dedup_ops
    from hadith_vector_search_spark.plans import dedup as dedup_plans

    sharr = dedup_plans.get_shingle_index(spark, sf_dir)
    is_new = (F.col("doc_id") % dedup_plans.INCR_MOD) == dedup_plans.INCR_REM
    bands_old = dedup_ops.band_explode(
        dedup_ops.minhash_signatures(sharr.filter(~is_new)))
    auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        write_bucketed(bands_old, "t_bands_b",
                       str(tmp_path / "bands_b"), "band_key", 8)
        b = spark.table("t_bands_b")
        # an incoming doc's band keys = a point-lookup list
        keys = [r.band_key for r in bands_old.limit(2).collect()]
        probe = b.filter(F.col("band_key").isin(*keys))
        plan = probe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        sel = [ln.strip() for ln in plan.splitlines()
               if "SelectedBucketsCount" in ln]
        assert sel, "no bucket pruning in plan:\n" + plan
        import re as _re
        m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", sel[0])
        assert m and int(m.group(1)) < int(m.group(2)), sel[0]
        assert probe.count() == bands_old.filter(
            F.col("band_key").isin(*keys)).count()
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", auto)
        spark.sql("DROP TABLE IF EXISTS t_bands_b")
