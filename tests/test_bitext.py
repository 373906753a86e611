"""Bitext mining: pinned against a pure-Python bucket+margin miner and a
plan audit (bucket equi-join, never a cartesian src × tgt)."""

import hashlib
import math

SF = "/root/testdata/sf0.001"


def _planes(dim=64):
    from ragflow_core16_spark.operators.similarity import (N_PLANES,
                                                           _plane_component)
    return [[_plane_component(p, d) for d in range(dim)]
            for p in range(N_PLANES)]


def _bucket(v, planes):
    b = 0
    for p, plane in enumerate(planes):
        if sum(x * y for x, y in zip(v, plane)) >= 0:
            b += 1 << p
    return b


class TestBitextMine:
    def test_matches_pure_python_miner(self, spark):
        from ragflow_core16_spark.operators.similarity import (
            BITEXT_MIN_COS, BITEXT_MIN_MARGIN, bitext_mine)
        rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
                for r in rows}
        planes = _planes()
        buckets = {vid: _bucket(v, planes) for vid, v in vecs.items()}
        want = {}
        for sid, sv in vecs.items():
            if sid % 2:
                continue
            cands = []
            for tid, tv in vecs.items():
                if tid % 2 == 0 or buckets[tid] != buckets[sid]:
                    continue
                dot = sum(x * y for x, y in zip(sv, tv))
                cos = round(dot / (math.sqrt(sum(x * x for x in sv)) *
                                   math.sqrt(sum(y * y for y in tv))), 4)
                cands.append((cos, tid))
            if not cands:
                continue
            cands.sort(key=lambda c: (-c[0], c[1]))
            best, second = cands[0], cands[1] if len(cands) > 1 else None
            margin = round(best[0] - (second[0] if second else 0.0), 4)
            want[sid] = (best[1], best[0], margin,
                         best[0] >= BITEXT_MIN_COS
                         and margin >= BITEXT_MIN_MARGIN)
        got = {r["src_id"]: (r["tgt_id"], r["cosine"], r["margin"],
                             r["accepted"])
               for r in bitext_mine(spark, SF).collect()}
        assert got == want
        assert any(v[3] for v in want.values())
        assert any(not v[3] for v in want.values())

    def test_plan_bucket_equi_join_no_cartesian(self, spark):
        from conftest import formatted_plan

        from ragflow_core16_spark.operators.similarity import (
            _bitext_ranked)
        # audit the production (pre-sort) relation: the shards meet in a
        # bucket-keyed equi-join, never a cartesian/nested-loop product
        plan = formatted_plan(_bitext_ranked(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Join" in plan
