"""Behavior tests for plans/pipeline_ops33.py (cross-source surprisal,
SimHash multi-probe, effective token budget).

The DuckDB-oracle gate covers end-to-end equality; these pin the
multi-probe recall guarantee on hand-built signatures, the OOV
penalty, and the budget accounting against pandas."""

from __future__ import annotations

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# Cross-source surprisal
# ---------------------------------------------------------------------------
def test_xsurprisal_matrix_shape_and_diagonal(spark, sf_dir):
    out = _run(spark, sf_dir, "cross_source_surprisal")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    srcs = docs["source"].nunique()
    assert len(out) == srcs * srcs
    # token totals: evaluating source B costs the same n_tokens under
    # every training source
    per_esrc = out.groupby("esrc")["n_tokens"].nunique()
    assert (per_esrc == 1).all()
    # the diagonal (self-scored) has no OOV terms, so for each eval
    # source the self cost uses only in-vocab bits; an OOV-heavy
    # off-diagonal entry can only add bits per OOV token relative to
    # scoring those same tokens in-vocab at the rarest rank
    assert (out["xent_bits"] >= 0).all()


def test_xsurprisal_oov_penalty(spark):
    """Two disjoint-vocabulary sources: cross entries must price every
    token as OOV — bitlen(total)+1 bits per token exactly."""
    import os, tempfile

    rows = []
    for i in range(8):
        rows.append((i, "aaa bbb ccc ddd", "A", 15))
    for i in range(8, 16):
        rows.append((i, "eee fff ggg hhh", "B", 15))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = _run(spark, tmp, "cross_source_surprisal").set_index(
            ["tsrc", "esrc"]
        )
        # each source: 8 docs x 4 tokens = 32 tokens, bitlen(32) = 6
        oov_bits_per_token = 6 + 1
        assert out.loc[("A", "B"), "xent_bits"] == 32 * oov_bits_per_token
        assert out.loc[("B", "A"), "xent_bits"] == 32 * oov_bits_per_token
        # self-score: every term has cf 8, bitlen(8)=4 -> 6-4=2 bits
        assert out.loc[("A", "A"), "xent_bits"] == 32 * 2


# ---------------------------------------------------------------------------
# SimHash multi-probe
# ---------------------------------------------------------------------------
def test_multiprobe_census_matches_bruteforce(spark, sf_dir):
    from bikes_data_warehouse_etl_spark.operators.dedup import simhash_per_doc
    from bikes_data_warehouse_etl_spark.plans.synthetic import _t

    sig = simhash_per_doc(_t(spark, sf_dir, "documents")).toPandas()
    out = _run(spark, sf_dir, "simhash_multiprobe")
    import itertools

    census = {}
    for (ia, sa), (ib, sb) in itertools.combinations(
        sig.sort_values("id")[["id", "simhash"]].itertuples(index=False), 2
    ):
        d = bin(sa ^ sb).count("1")
        if d <= 2:
            census[d] = census.get(d, 0) + 1
    got = dict(zip(out["hamming"], out["n_pairs"]))
    assert got == census


# ---------------------------------------------------------------------------
# Effective token budget
# ---------------------------------------------------------------------------
def test_token_budget_accounting(spark, sf_dir):
    out = _run(spark, sf_dir, "effective_token_budget")
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def norm_toks(t):
        return [x for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if x]

    docs["n_tok"] = docs["text"].map(lambda t: len(norm_toks(t)))
    docs["fp"] = docs["text"].map(lambda t: " ".join(norm_toks(t)))
    keep = docs.groupby("fp")["doc_id"].min()
    docs["kept"] = docs["doc_id"].isin(set(keep))
    ref = docs.groupby("source").apply(
        lambda g: pd.Series(
            {
                "raw": g["n_tok"].sum(),
                "kept": g.loc[g["kept"], "n_tok"].sum(),
            }
        ),
        include_groups=False,
    )
    for _, r in out.iterrows():
        assert r["raw_tokens"] == ref.loc[r["source"], "raw"]
        assert r["kept_tokens"] == ref.loc[r["source"], "kept"]
        assert (
            r["dup_tax_bp"]
            == (r["raw_tokens"] - r["kept_tokens"]) * 10000 // r["raw_tokens"]
        )
