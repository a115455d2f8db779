"""nDCG@k: equals a pure-Python replay of the whole self-labeling
protocol (query-term pick, BM25, grading, discounted folds) on a
crafted corpus, and a corpus whose BM25 order coincides with the ideal
order scores ndcg == 1.0."""

from __future__ import annotations

import math

from sql_data_warehouse_and_analytics_project_spark.operators import ranking_eval as re_

K1, B = 1.2, 0.75


def _py_ndcg(corpus, k=10, qmod=100, nq=3):
    toks = {d: t.split() for d, t in corpus}
    tf = {d: {} for d, _ in corpus}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for d in tf:
        for t in tf[d]:
            df[t] = df.get(t, 0) + 1
    out = {}
    for q in [d for d, _ in corpus if d % qmod == 0]:
        qts = sorted(tf[q].items(), key=lambda kv: (-kv[1], kv[0]))[:nq]
        scores = {}
        for d in tf:
            if d == q:
                continue
            s = 0.0
            for t, _ in qts:
                f = tf[d].get(t, 0)
                if f:
                    idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                    s += idf * (f * (K1 + 1.0)) / (f + K1 * (1 - B + B * len(toks[d]) / avgdl))
            if s:
                scores[d] = round(s, 6)
        rel = {}
        qset = set(toks[q])
        for d in tf:
            if d == q:
                continue
            o = len(qset & set(toks[d]))
            rel[d] = 3 if o >= 8 else 2 if o >= 5 else 1 if o >= 2 else 0
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:k]
        dcg = sum((2 ** rel.get(d, 0) - 1) / math.log2(i + 2) for i, d in enumerate(ranked))
        ideal = sorted((d for d in rel if rel[d] > 0), key=lambda d: (-rel[d], d))[:k]
        idcg = sum((2 ** rel[d] - 1) / math.log2(i + 2) for i, d in enumerate(ideal))
        out[q] = (round(dcg, 6), round(idcg, 6), round(dcg / idcg, 6) if idcg else None)
    return out


def _corpus():
    base = ["alpha beta gamma delta", "beta gamma", "zeta eta theta iota"]
    docs = []
    for i in range(40):
        words = base[i % 3].split() * (1 + i % 3)
        extra = [f"w{i % 7}", f"w{(i * 3) % 11}"]
        docs.append((i, " ".join(words + extra)))
    docs.append((100, "alpha alpha beta beta gamma delta w1 w2"))  # query doc
    return docs


def test_ndcg_matches_python_reference(spark):
    corpus = _corpus()
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in corpus],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {
        r["query_id"]: (r["dcg"], r["idcg"], r["ndcg"])
        for r in re_.ndcg_at_k(df).collect()
    }
    exp = _py_ndcg(corpus)
    # doc 0 is also a query (0 % 100 == 0)
    assert set(got) == set(exp)
    for q in exp:
        for a, b in zip(got[q], exp[q]):
            assert (a is None and b is None) or abs(a - b) < 2e-6, (q, got[q], exp[q])
    assert all(v[2] is None or 0.0 <= v[2] <= 1.0 for v in got.values())


def test_ndcg_perfect_when_ranking_matches_ideal(spark):
    """A corpus where BM25 ranks exactly by relevance grade: ndcg == 1."""
    q = "alpha beta gamma " * 4  # query doc: top terms alpha/beta/gamma
    docs = [(100, q.strip())]
    # graded tiers: more shared distinct tokens AND stronger tf together
    docs += [(1, "alpha beta gamma alpha beta gamma w1 w2 w3 w4 w5 w6 w7 w8")]
    docs += [(2, "alpha beta x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12")]
    docs += [(3 + i, f"y{i}a y{i}b y{i}c y{i}d") for i in range(8)]
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r["query_id"]: r for r in re_.ndcg_at_k(df).collect()}
    assert out[100]["ndcg"] == 1.0
