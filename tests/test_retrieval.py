"""Third-derivation pins for the retrieval composition operators
(oracle parity already checks Spark == DuckDB; these check both
against numpy / hand computation so a shared semantics misreading
can't slip through)."""

from __future__ import annotations

import math

import numpy as np

from hadoop_cs4225_spark import registry
from tests.conftest import SF_SMOKE

# retrieval composes registered oracles — the registry must be fully
# populated before its module-level decorators run
registry.load_all()

from hadoop_cs4225_spark.operators.retrieval import (  # noqa: E402
    NDCG_K,
    RRF_K,
)


def test_rrf_matches_hand_fusion(spark):
    """Fused scores must equal 1/(k+r_lex) + 1/(k+r_sem) computed by
    hand from the two arms' own orderings, and every fused doc must
    come from one of the arms."""
    from hadoop_cs4225_spark.operators.similarity import cosine_topk_brute
    from hadoop_cs4225_spark.operators.text_analysis import bm25_search_topk

    lex = bm25_search_topk(spark, SF_SMOKE).toPandas()
    sem = cosine_topk_brute(spark, SF_SMOKE).toPandas()
    lex_rank = {
        d: i + 1
        for i, d in enumerate(
            lex.sort_values(["bm25", "doc_id"], ascending=[False, True])[
                "doc_id"
            ]
        )
    }
    sem_rank = {
        v: i + 1
        for i, v in enumerate(
            sem.sort_values(["cos_sim", "vec_id"], ascending=[False, True])[
                "vec_id"
            ]
        )
    }
    want = {
        d: (1.0 / (RRF_K + lex_rank[d]) if d in lex_rank else 0.0)
        + (1.0 / (RRF_K + sem_rank[d]) if d in sem_rank else 0.0)
        for d in set(lex_rank) | set(sem_rank)
    }
    got = registry.QUERIES["hybrid_search_rrf"](spark, SF_SMOKE).toPandas()
    assert set(got["doc_id"]) <= set(want)
    for _, row in got.iterrows():
        assert abs(row["rrf_score"] - want[row["doc_id"]]) < 1e-6
    # the output is the TOP-10 of the fused ranking
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert list(got["doc_id"]) == [d for d, _ in top]
    # a doc ranked by both arms outscores the best single-arm-only doc
    both = [d for d in want if d in lex_rank and d in sem_rank]
    if both:
        single_best = max(
            v for d, v in want.items() if (d in lex_rank) != (d in sem_rank)
        )
        assert max(want[d] for d in both) > single_best


def test_ndcg_matches_numpy(spark):
    """Per-method NDCG must match a direct numpy computation from the
    method frames and the brute ground truth, and sit in [0, 1]."""
    from hadoop_cs4225_spark.operators.pq import pq_adc_query_topk
    from hadoop_cs4225_spark.operators.similarity import (
        ann_lsh_multiprobe_topk,
        ann_lsh_query_topk,
        ann_rerank_topk,
        cosine_topk_brute,
        ivf_ann_query_topk,
    )

    brute = cosine_topk_brute(spark, SF_SMOKE).toPandas()
    brute = brute.sort_values(
        ["cos_sim", "vec_id"], ascending=[False, True]
    ).head(NDCG_K)
    rel = {v: NDCG_K - i for i, v in enumerate(brute["vec_id"])}
    idcg = sum(
        (NDCG_K - i) / math.log2(i + 2) for i in range(len(brute))
    )
    fns = {
        "lsh": ann_lsh_query_topk,
        "lsh_multi": ann_lsh_multiprobe_topk,
        "ivf": ivf_ann_query_topk,
        "pq": pq_adc_query_topk,
        "rerank": ann_rerank_topk,
    }
    want = {}
    for label, fn in fns.items():
        m = fn(spark, SF_SMOKE).toPandas()
        m = m.sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        ).head(NDCG_K)
        dcg = sum(
            rel.get(v, 0) / math.log2(i + 2)
            for i, v in enumerate(m["vec_id"])
        )
        want[label] = dcg / idcg
    got = registry.QUERIES["ann_ndcg_audit"](spark, SF_SMOKE).toPandas()
    assert sorted(got["method"]) == sorted(want)
    for _, row in got.iterrows():
        assert abs(row[f"ndcg_at_{NDCG_K}"] - want[row["method"]]) < 1e-6
        assert 0.0 <= row[f"ndcg_at_{NDCG_K}"] <= 1.0


def test_w1_matches_numpy_integral(spark):
    """W1 per source must equal the numpy CDF-gap integral over the
    merged value grid (the textbook 1-D earth-mover computation)."""
    import pandas as pd

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    got = registry.QUERIES["source_length_w1_drift"](
        spark, SF_SMOKE
    ).toPandas()
    corpus = np.sort(docs["n_chars"].to_numpy())
    grid = np.unique(corpus)
    gaps = np.diff(grid)
    f_g = np.searchsorted(corpus, grid, side="right") / len(corpus)
    for _, row in got.iterrows():
        s = np.sort(
            docs.loc[docs["source"] == row["source"], "n_chars"].to_numpy()
        )
        assert row["n_docs"] == len(s)
        f_s = np.searchsorted(s, grid, side="right") / len(s)
        w1 = float(np.sum(np.abs(f_s - f_g)[:-1] * gaps))
        assert abs(row["w1_chars"] - w1) < 1e-3
    assert set(got["source"]) == set(docs["source"].unique())


def test_mmr_matches_greedy_numpy(spark):
    """MMR picks must equal the textbook greedy recursion computed in
    numpy from the candidate pool (6-dp-quantized sims, vec_id ties)."""
    from hadoop_cs4225_spark.operators.retrieval import (
        MMR_K,
        MMR_LAMBDA,
        mmr_diverse_topk,
    )
    from hadoop_cs4225_spark.operators.similarity import cosine_topk_brute

    import pandas as pd

    brute = cosine_topk_brute(spark, SF_SMOKE).toPandas()
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for _, r in emb[emb["vec_id"].isin(brute["vec_id"])].iterrows()
    }

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    def cos(a, b):
        return q6(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))))

    relq = dict(zip(brute["vec_id"], brute["cos_sim"]))
    pool = sorted(relq)
    selected: list[int] = []
    want = []
    for step in range(1, MMR_K + 1):
        best = None
        for c in pool:
            if c in selected:
                continue
            pen = max((cos(vecs[c], vecs[s]) for s in selected), default=0.0)
            mmr = MMR_LAMBDA * relq[c] - (1 - MMR_LAMBDA) * pen
            if best is None or mmr > best[1] or (mmr == best[1] and c < best[0]):
                best = (c, mmr)
        selected.append(best[0])
        want.append((step, best[0], q6(best[1])))
    got = [
        (int(r["pick"]), int(r["vec_id"]), float(r["mmr_score"]))
        for _, r in mmr_diverse_topk(spark, SF_SMOKE).toPandas().iterrows()
    ]
    assert [(p, v) for p, v, _ in [(p, v, m) for p, v, m in got]] == [
        (p, v) for p, v, _ in want
    ]
    for (_, _, gm), (_, _, wm) in zip(got, want):
        assert abs(gm - wm) < 1e-6
    # diversification must actually reorder vs pure relevance
    assert len(set(v for _, v, _ in got)) == MMR_K


def test_source_perplexity_is_weighted_rollup_of_doc_logprob(spark):
    """source ppl must equal exp(-(sum over docs of n_bigrams*avg_logp)
    / total bigrams) computed from the SIBLING registered query — the
    two score under one shared LM by construction."""
    import pandas as pd

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "source"]
    ]
    per_doc = (
        registry.QUERIES["doc_bigram_logprob"](spark, SF_SMOKE)
        .toPandas()
        .merge(docs, on="doc_id")
    )
    got = registry.QUERIES["source_bigram_perplexity"](
        spark, SF_SMOKE
    ).toPandas()
    for _, row in got.iterrows():
        g = per_doc[per_doc["source"] == row["source"]]
        n = int(g["n_bigrams"].sum())
        assert row["n_bigrams"] == n
        # per-doc avg_logp is quantized at 6dp, so the re-weighted
        # mean carries up to ~1e-6 of quantization noise per doc
        mean = float((g["n_bigrams"] * g["avg_logp"]).sum()) / n
        assert abs(row["avg_logp"] - mean) < 1e-4
        assert abs(row["perplexity"] - math.exp(-row["avg_logp"])) < 2e-4
        assert row["perplexity"] > 1.0  # nonzero LM entropy


def test_ngram_novelty_matches_pandas_reference(spark):
    """Novelty fractions must equal a pure-Python re-derivation
    (regex-split tokens -> distinct 3-gram shingles -> hash-split
    train/test -> set difference)."""
    import hashlib
    import re

    import pandas as pd

    from hadoop_cs4225_spark.operators.sampling import TRAIN_PCT

    def h60(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 4

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    shingles = {}
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"[ \t\n\r\f]+", r["text"]) if t]
        if len(toks) < 3:
            continue
        shingles[int(r["doc_id"])] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    train = set().union(
        *(
            s
            for d, s in shingles.items()
            if h60(str(d)) % 100 < TRAIN_PCT
        )
    )
    want = {}
    for d, s in shingles.items():
        if h60(str(d)) % 100 < TRAIN_PCT:
            continue
        novel = len(s - train)
        want[d] = (len(s), novel, novel / len(s))
    got = registry.QUERIES["eval_ngram_novelty"](spark, SF_SMOKE).toPandas()
    # the query returns the bottom-100 by novelty; every returned row
    # must match the reference exactly
    assert len(got) == min(100, len(want))
    for _, row in got.iterrows():
        n, novel, frac = want[int(row["doc_id"])]
        assert row["n_shingles"] == n
        assert row["n_novel"] == novel
        assert abs(row["novelty_frac"] - frac) < 1e-4
    # and be the true bottom-k of the reference ranking
    ref_order = sorted(want.items(), key=lambda kv: (kv[1][2], kv[0]))
    assert list(got["doc_id"]) == [d for d, _ in ref_order[: len(got)]]


def test_k_anonymity_matches_pandas(spark):
    import math as _math

    import pandas as pd

    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    g = (
        cust.assign(
            bal_band=(cust["c_acctbal"] / 1000).map(_math.floor)
        )
        .groupby(["c_nationkey", "c_mktsegment", "bal_band"])
        .size()
    )
    got = registry.QUERIES["customer_k_anonymity_audit"](
        spark, SF_SMOKE
    ).collect()[0]
    assert got["k"] == 5
    assert got["n_groups"] == len(g)
    assert got["min_group_size"] == int(g.min())
    assert got["n_groups_below_k"] == int((g < 5).sum())
    assert got["n_records_at_risk"] == int(g[g < 5].sum())
    assert abs(got["pct_at_risk"] - g[g < 5].sum() / g.sum()) < 1e-6


def test_join_size_estimate_equals_actual_join(spark):
    """The histogram-based estimate must equal the ACTUAL self-join
    row count (the whole point: same number, no join executed)."""
    from hadoop_cs4225_spark.sources.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey")
    actual = li.alias("a").join(li.alias("b"), "l_partkey").count()
    rows = registry.QUERIES["partkey_join_size_estimate"](
        spark, SF_SMOKE
    ).collect()
    assert rows, "estimate returned no rows"
    assert all(r["join_rows"] == actual for r in rows)
    assert rows[0]["n_input"] == li.count()
    # per-key contributions are consistent and ordered
    for r in rows:
        assert r["key_join_rows"] == r["n_rows"] ** 2
        assert 0 < r["pct_of_join"] <= 1
    sizes = [r["key_join_rows"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
