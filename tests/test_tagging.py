"""Tagging stand-in invariants: prior smoothing, the integer scoring rule
vs a float re-derivation of the reference formula, top-n gating, and plan
shape (prior broadcast, term-keyed match join)."""

import pytest

from conftest import formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ops():
    from ragflow_core16_spark.operators import tagging
    return tagging


def test_prior_portions_smoothed(spark, ops):
    rows = ops.all_tags_portion(spark, SF).collect()
    assert rows
    total = sum(r.c for r in rows)
    fams = {r.tag.split(":")[0] for r in rows}
    assert fams == {"src", "lang", "kw"}
    for r in rows:
        assert r.portion_ppb == (r.c + 1) * 1_000_000_000 // (total + ops.S)
        assert r.portion_ppb > 0


def test_tag_content_matches_reference_formula(spark, ops):
    """Re-derive search.py:458-469 in floats per doc and check the integer
    per-mille readout agrees (away-from-zero rounding of a positive
    quotient)."""
    prior = {r.tag: (r.c, None) for r in
             ops.all_tags_portion(spark, SF).collect()}
    total = sum(c for c, _ in prior.values())
    rows = ops.tag_content(spark, SF).collect()
    assert rows
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    # spot-verify a handful of docs end-to-end against a python re-derivation
    from ragflow_core16_spark.operators.textstats import _tfidf_ranked
    kw = {}
    for r in _tfidf_ranked(spark, SF).collect():
        kw.setdefault(r.doc_id, []).append(r.term)
    tags = {}
    for r in ops._tags(spark, SF).collect():
        tags.setdefault(r.doc_id, []).append(r.tag)
    term_docs = {}
    for d, terms in kw.items():
        for t in terms:
            term_docs.setdefault(t, set()).add(d)
    for doc_id in sorted(per_doc)[:5]:
        match = set()
        for t in kw[doc_id]:
            match |= term_docs[t]
        aggs = {}
        for m in match:
            for tg in tags[m]:
                aggs[tg] = aggs.get(tg, 0) + 1
        cnt = sum(aggs.values())
        scored = {}
        for tg, c in aggs.items():
            portion = (prior[tg][0] + 1) / (total + ops.S)
            val = ops.UNIT * 0.1 * (c + 1) / (cnt + ops.S) / portion
            n = (c + 1) * (total + ops.S)
            d = ops.SCALE * (cnt + ops.S) * (prior[tg][0] + 1)
            ipm = (2 * ops.UNIT * n + d) // (2 * d)
            assert abs(ipm - val) <= 0.5 + 1e-9
            scored[tg] = ipm
        expect = sorted(((s, t) for t, s in scored.items()),
                        key=lambda x: (-x[0], x[1]))[:ops.TOPN_TAGS]
        expect = [(t, s) for s, t in expect if s > 0]
        got = [(r.tag, r.score_pm) for r in
               sorted(per_doc[doc_id], key=lambda r: r.rank)]
        assert got == expect


def test_tag_content_shape(spark, ops):
    rows = ops.tag_content(spark, SF).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
        assert r.score_pm > 0
    for doc, rs in per_doc.items():
        assert 1 <= len(rs) <= ops.TOPN_TAGS
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))


def test_tag_query_topn(spark, ops):
    rows = ops.tag_query(spark, SF).collect()
    assert 1 <= len(rows) <= ops.TOPN_TAGS
    for r in rows:
        assert r.score_pm >= 1  # the reference's max(1, score)


def test_tag_content_plan_broadcasts_prior(spark, ops):
    plan = formatted_plan(ops._tag_content_scored(spark, SF))
    assert "CartesianProduct" not in plan
    # the corpus prior must ride broadcast, not shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
