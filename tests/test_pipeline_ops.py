"""Semantics of the round-2 pipeline operators (plans/pipeline_ops.py).

Cross-engine value equality is the oracle gate's job; these pin the
*invariants* that survive any corpus: sampling determinism and rate
bounds, posting-list ordering, retention arithmetic, profiling
consistency.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans import QUERIES


def test_sample_stratified_deterministic_and_rate_bounded(spark, sf_dir):
    q = QUERIES["sample_stratified"].spark
    a = {r["doc_id"] for r in q(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in q(spark, sf_dir).collect()}
    assert a == b  # same docs every run — no RNG, no partition dependence

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    by_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = (
        q(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in got:
        target = 0.1 if r["lang"] == "en" else 0.3
        rate = r["n"] / by_lang[r["lang"]]
        assert abs(rate - target) < 0.15  # md5 uniformity, small-n tolerance


def test_top_terms_ordered_and_bounded(spark, sf_dir):
    rows = QUERIES["top_terms"].spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    pairs = [(-r["n"], r["term"]) for r in rows]
    assert pairs == sorted(pairs)  # count desc, term asc


def test_inverted_index_postings_sorted_and_consistent(spark, sf_dir):
    rows = QUERIES["inverted_index"].spark(spark, sf_dir).collect()
    assert rows, "rarity band must be non-empty at every SF"
    for r in rows:
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == r["df"]  # df is exactly the posting length
        assert len(set(ids)) == len(ids)


def test_doc_rarity_bounds(spark, sf_dir):
    # mean document-frequency of a doc's terms can never exceed the
    # corpus size (a term appears in at most every doc)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = QUERIES["doc_rarity_score"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["mean_df_ppm"] <= n_docs * 1_000_000
        assert r["n_terms"] > 0


def test_neardup_components_closure(spark, sf_dir):
    """Components must be closed over the pair graph: both endpoints of
    every verified pair share a component, the representative is the
    min member, and n_members is consistent."""
    from bikes_data_warehouse_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from bikes_data_warehouse_etl_spark.sources.parquet import read_table

    comp = {
        r["doc_id"]: r["component_id"]
        for r in QUERIES["neardup_components"].spark(spark, sf_dir).collect()
    }
    assert comp
    pairs = ngram_jaccard_pairs(
        read_table(spark, sf_dir, "documents"), threshold=0.2
    ).collect()
    for p in pairs:
        assert comp[p["id_a"]] == comp[p["id_b"]]
    # representative is the smallest member of its component
    from collections import defaultdict

    members = defaultdict(list)
    for doc, c in comp.items():
        members[c].append(doc)
    for c, docs in members.items():
        assert c == min(docs)


def test_neardup_components_chain_transitivity(spark):
    """A~B, B~C but never A~C must still collapse to one component."""
    from bikes_data_warehouse_etl_spark.operators.dedup import (
        neardup_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component_id"]
        for r in neardup_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_neardup_components_deep_chain_plan_bounded(spark):
    """A diameter-50 path graph: min-label propagation needs ~50
    rounds, so without lineage truncation the returned frame's plan
    nests 50 join+aggregate layers. The eager localCheckpoint every 5
    rounds must (a) still converge to one component and (b) leave the
    final plan rooted at the last checkpoint — analyzed-plan size
    bounded by the 5-round tail, not the 50-round history."""
    from bikes_data_warehouse_etl_spark.operators.dedup import (
        neardup_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], ["id_a", "id_b"]
    )
    out = neardup_components(chain, max_iter=60)
    got = {r["node"]: r["component_id"] for r in out.collect()}
    assert got == {i: 0 for i in range(51)}

    plan = out._jdf.queryExecution().analyzed().toString()
    # one loop round contributes ~40 plan lines; 5-round tails stay in
    # the hundreds, a 50-round uncheckpointed lineage is thousands
    assert len(plan.splitlines()) < 600, len(plan.splitlines())


def test_event_funnel_monotone(spark, sf_dir):
    r = QUERIES["event_funnel"].spark(spark, sf_dir).collect()[0]
    assert r["n_view_users"] >= r["n_view_then_click"] >= r["n_full_funnel"]
    assert r["n_view_users"] > 0


def test_curated_corpus_invariants(spark, sf_dir):
    rows = QUERIES["curated_corpus"].spark(spark, sf_dir).collect()
    assert rows
    # every survivor clears the quality gate
    assert all(r["quality"] >= 0.5 and r["tok_cnt"] >= 20 for r in rows)
    # split is exhaustive and roughly 90/5/5 (hash uniformity)
    splits = [r["split"] for r in rows]
    assert set(splits) <= {"train", "val", "test"}
    train_frac = splits.count("train") / len(splits)
    assert 0.8 <= train_frac <= 0.97
    # dedup keeps at most one row per doc (and per content, transitively)
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    # deterministic end to end
    again = QUERIES["curated_corpus"].spark(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_user_retention_weekly_arithmetic(spark, sf_dir):
    rows = QUERIES["user_retention_weekly"].spark(spark, sf_dir).collect()
    assert rows
    by_wk = sorted(rows, key=lambda r: r["wk"])
    assert all(0 <= r["retained"] <= r["wau"] for r in rows)
    # retained(w) can never exceed the previous week's active count
    for prev, cur in zip(by_wk, by_wk[1:]):
        if (cur["wk"] - prev["wk"]).days == 7:
            assert cur["retained"] <= prev["wau"]
    # the first observed week has nobody to be retained from
    assert by_wk[0]["retained"] == 0


def test_column_completeness_profile(spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    rows = {r["col_name"]: r for r in
            QUERIES["column_completeness"].spark(spark, sf_dir).collect()}
    assert set(rows) == {"c_name", "c_acctbal", "c_mktsegment"}
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
    assert rows["c_name"]["n_distinct"] == n  # names are unique


def test_key_skew_profile_invariants(spark, sf_dir):
    r = QUERIES["key_skew_profile"].spark(spark, sf_dir).collect()[0]
    assert r["min_rows"] <= r["avg_rows_floor"] <= r["max_rows"]
    assert r["min_rows"] <= r["p99_rows"] <= r["max_rows"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert r["n_keys"] == li.select("l_partkey").distinct().count()


def test_pretoken_regex_splits_all_three_classes(spark):
    """The BPE-style pretokenizer regex must split letter runs, digit
    runs, and SINGLE punctuation marks (the testdata corpus is
    all-alpha, so the oracle only exercises one class — this pins the
    other two on crafted text)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "Call 911, it's A1-grade!")], "doc_id long, text string"
    )
    toks = df.select(
        F.explode(
            F.expr(
                r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"
            )
        ).alias("tok")
    )
    got = [r["tok"] for r in toks.collect()]
    assert got == [
        "Call", "911", ",", "it", "'", "s", "A", "1", "-", "grade", "!",
    ]


def test_neardup_components_raises_on_truncated_propagation(spark):
    """Exhausting max_iter before the labels converge must raise —
    truncated labels are WRONG (docs of one component keep different
    ids), not approximate."""
    import pytest

    from bikes_data_warehouse_etl_spark.operators.dedup import (
        neardup_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(chain, max_iter=5)
