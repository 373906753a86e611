"""Batch-2 corpus operators: capture drift, winnowing fingerprints, Zipf
spectrum — each pinned against an independent pure-Python reimplementation
(never the Spark expressions)."""

import hashlib
from collections import Counter

SF = "/root/testdata/sf0.001"


def _md5i(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _docs(spark):
    return {r["doc_id"]: " ".join(r["text"].lower().split()).split(" ")
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}


class TestCaptureDrift:
    def test_matches_pure_python_set_jaccard(self, spark):
        from ragflow_core16_spark.operators.training import capture_drift
        toks = _docs(spark)
        got = {r["doc_id"]: r for r in capture_drift(spark, SF).collect()}
        assert set(got) == set(toks)
        classes = Counter()
        for d, w in toks.items():
            r = got[d]
            if _md5i(f"42:dr:{d}") % 2 != 0:
                assert r["n_captures"] == 1 and r["jaccard"] is None
                assert r["drift_class"] == "single"
            else:
                k = _md5i(f"42:dk:{d}") % 20 + 1
                prev = w[k:]
                jac = round(len(set(w) & set(prev)) /
                            max(len(set(w) | set(prev)), 1), 4)
                assert r["n_captures"] == 2
                assert abs(r["jaccard"] - jac) < 1e-9, (d, r["jaccard"], jac)
                want = ("stable" if jac >= 0.9 else
                        "minor" if jac >= 0.5 else "rewritten")
                assert r["drift_class"] == want
            classes[r["drift_class"]] += 1
        assert all(classes[c] > 0
                   for c in ("single", "stable", "minor", "rewritten"))


def _winnow_py(words, k=3, w=4):
    if len(words) < k + w - 1:
        return None
    h = [_md5i(" ".join(words[i:i + k]))
         for i in range(len(words) - k + 1)]
    wins = [min(h[j:j + w]) for j in range(len(h) - w + 1)]
    return h, sorted(set(wins))


class TestWinnowFingerprints:
    def test_matches_pure_python_winnowing(self, spark):
        from ragflow_core16_spark.operators.dedup import winnow_fingerprints
        toks = _docs(spark)
        got = {r["doc_id"]: r
               for r in winnow_fingerprints(spark, SF).collect()}
        n_checked = 0
        for d, words in list(toks.items())[:60]:
            ref = _winnow_py(words)
            if ref is None:
                assert d not in got
                continue
            h, fps = ref
            r = got[d]
            assert r["n_kgrams"] == len(h)
            assert r["n_fps"] == len(fps)
            assert r["fp_min"] == fps[0]
            x = 0
            for f in fps:
                x ^= f
            assert r["fp_xor"] == x
            n_checked += 1
        assert n_checked > 10

    def test_shared_run_guarantee(self):
        """Any shared run of ≥ k+w-1 words must share a fingerprint
        (the SIGMOD'03 winnowing theorem) — checked on adversarial pairs."""
        base = ("the quick brown fox jumps over the lazy dog near the old "
                "river bank today").split()
        for prefix in (["alpha", "beta"], ["x"] * 7, []):
            a = _winnow_py(base)[1]
            b = _winnow_py(prefix + base + ["omega"])[1]
            assert set(a) & set(b), (prefix, a, b)


class TestZipfHistogram:
    def test_buckets_integer_exact(self, spark):
        from ragflow_core16_spark.operators.textstats import zipf_histogram
        toks = _docs(spark)
        freqs = Counter()
        for w in toks.values():
            freqs.update(w)
        buckets = {}
        for _tok, c in freqs.items():
            b = c.bit_length() - 1
            v = buckets.setdefault(b, [0, 0, None, None])
            v[0] += 1
            v[1] += c
            v[2] = c if v[2] is None else min(v[2], c)
            v[3] = c if v[3] is None else max(v[3], c)
        got = {r["log2_bucket"]: r for r in zipf_histogram(spark, SF).collect()}
        assert set(got) == set(buckets)
        for b, (vocab, occ, mn, mx) in buckets.items():
            r = got[b]
            assert (r["vocab_size"], r["occurrences"],
                    r["min_count"], r["max_count"]) == (vocab, occ, mn, mx)
            # power-of-two boundaries are exact: bucket b spans [2^b, 2^(b+1))
            assert 2 ** b <= mn and mx < 2 ** (b + 1)


class TestNewOpPlans:
    """The in-row claims in docs/PLANS.md, pinned: drift and winnowing
    must not shuffle before the presentation sort."""

    def _plan(self, df):
        from conftest import formatted_plan
        return formatted_plan(df)

    def test_winnow_shuffle_free_before_sort(self, spark):
        from pyspark.sql import functions as F
        from ragflow_core16_spark.operators.dedup import _NORM
        # rebuild the pre-sort relation over the raw scan (the operator's
        # _docs adds the small-fixture spread() repartition; at real scale
        # the scan has thousands of splits and that guard is a no-op) —
        # everything below the presentation sort must be scan-side
        d = spark.read.parquet(f"{SF}/documents.parquet")
        toks = F.split(F.regexp_replace(F.lower(F.trim("text")), _NORM,
                                        " "), " ")
        pre = d.select("doc_id", toks.alias("toks")).filter(
            F.size("toks") >= 6)
        plan = self._plan(pre)
        assert "Exchange" not in plan.replace("Reused", "")
        assert "MapInPandas" not in plan

    def test_capture_drift_single_python_free_stage(self, spark):
        from ragflow_core16_spark.operators.training import capture_drift
        plan = self._plan(capture_drift(spark, SF))
        assert "MapInPandas" not in plan and "EvalPython" not in plan


class TestMixtureSample:
    def test_matches_pure_python_integer_math(self, spark):
        from ragflow_core16_spark.operators.training import (
            _MIX_PPM, _MIX_WEIGHTS, mixture_sample)
        rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
        srcs = {}
        for r in rows:
            nt = len(" ".join(r["text"].lower().split()).split(" "))
            s = srcs.setdefault(r["source"], {"docs": [], "tokens": 0})
            s["docs"].append((r["doc_id"], nt))
            s["tokens"] += nt
        W = sum(_MIX_WEIGHTS.values())
        k = min(s["tokens"] * W // _MIX_WEIGHTS[name]
                for name, s in srcs.items())
        got = {r["source"]: r for r in mixture_sample(spark, SF).collect()}
        assert set(got) == set(srcs)
        binding = 0
        for name, s in srcs.items():
            w = _MIX_WEIGHTS[name]
            take = k * w // W
            rate = take * _MIX_PPM // s["tokens"]
            kept = [(d, nt) for d, nt in s["docs"]
                    if _md5i(f"42:mix:{d}") % _MIX_PPM < rate]
            r = got[name]
            assert (r["weight"], r["n_docs"], r["tokens"]) == \
                (w, len(s["docs"]), s["tokens"])
            assert r["rate_ppm"] == rate, name
            assert r["n_kept"] == len(kept)
            assert r["kept_tokens"] == sum(nt for _d, nt in kept)
            binding += rate == _MIX_PPM
        # at least one source must be the binding one (samples at 1.0)
        assert binding >= 1


class TestRecrawlSchedule:
    def test_intervals_jitter_and_budget(self, spark):
        from collections import Counter as C

        from ragflow_core16_spark.operators.training import (
            _QUEUE_DAILY_BUDGET, _RECRAWL_DAYS, _RECRAWL_QUEUES,
            capture_drift, recrawl_schedule)
        cls = {r["doc_id"]: r["drift_class"]
               for r in capture_drift(spark, SF).collect()}
        rows = recrawl_schedule(spark, SF).collect()
        assert {r["doc_id"] for r in rows} == set(cls)
        loads = C((r["queue"], r["next_day"]) for r in rows)
        seen_classes, over, under = set(), 0, 0
        for r in rows:
            iv = _RECRAWL_DAYS[cls[r["doc_id"]]]
            assert r["drift_class"] == cls[r["doc_id"]]
            assert r["interval_days"] == iv
            # jittered day stays inside one interval window
            assert iv <= r["next_day"] <= 2 * iv - 1
            assert r["queue"] == _md5i(f"42:rcq:{r['doc_id']}") \
                % _RECRAWL_QUEUES
            assert r["day_load"] == loads[(r["queue"], r["next_day"])]
            assert r["over_budget"] == (r["day_load"] > _QUEUE_DAILY_BUDGET)
            seen_classes.add(r["drift_class"])
            over += r["over_budget"]
            under += not r["over_budget"]
        assert seen_classes == set(_RECRAWL_DAYS)
        assert over and under, "both budget branches must be populated"
