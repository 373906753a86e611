"""fastText-style quality classifier: pinned against an independent
pure-Python scorer (hashlib.md5, no Spark expressions), plus the
zero-shuffle plan audit (the score is one in-row aggregate; the only
Exchange allowed is the presentation sort)."""

import hashlib

from ragflow_core16_spark.operators.training import (_QC_B,
                                                     quality_classifier)

SF = "/root/testdata/sf0.001"


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _score(text: str):
    w = " ".join(text.lower().split()).split(" ")
    grams = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
    ssum = sum(_md5i(f"42:qw:{_md5i(g) % _QC_B}") % 2001 - 1000
               for g in grams)
    n = len(grams)
    milli = ssum // n if ssum >= 0 else -((-ssum) // n)
    return n, ssum, milli


class TestQualityClassifier:
    def test_matches_pure_python_scorer(self, spark):
        docs = {r["doc_id"]: r["text"]
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .collect() if r["text"].strip()}
        got = quality_classifier(spark, SF).collect()
        assert len(got) == len(docs)
        for r in got:
            n, ssum, milli = _score(docs[r["doc_id"]])
            assert (r["n_grams"], r["score_sum"], r["score_milli"]) == \
                (n, ssum, milli), r["doc_id"]
            assert r["wiki_like"] == (ssum >= 0)
            dice = _md5i(f"42:qd:{r['doc_id']}") % 1000
            assert r["keep"] == (ssum >= 0 or dice < milli + 1000)

    def test_lottery_readmits_some_low_scorers_only(self, spark):
        rows = quality_classifier(spark, SF).collect()
        low = [r for r in rows if not r["wiki_like"]]
        kept_low = [r for r in low if r["keep"]]
        # the lottery is a real lottery: some below-parity docs survive,
        # some don't (both branches populated on this corpus)
        assert low and kept_low and len(kept_low) < len(low)

    def test_plan_is_in_row(self, spark):
        from conftest import formatted_plan

        from ragflow_core16_spark.operators.training import _quality_scored
        # audit the production (unsorted) relation: the whole classifier
        # rides the scan — zero Exchange, zero Python stages
        plan = formatted_plan(_quality_scored(spark, SF))
        assert plan.count(") Exchange") == 0
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert "Join" not in plan
