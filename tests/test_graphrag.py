"""GraphRAG stand-in invariants: extraction tuples, resolution rule parity
with the reference's candidate gate, graph gating, community structure, and
plan shape (bounded joins, no cartesian)."""

import pytest

from conftest import formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ops():
    from ragflow_core16_spark.operators import graphrag
    return graphrag


def test_entity_extract_topk_and_types(spark, ops):
    rows = ops.entity_extract(spark, SF).collect()
    assert rows, "no entities extracted"
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
        assert r.etype in ("concept", "term", "rare")
        assert " " in r.entity and r.entity == r.entity.lower()
        assert r.mentions >= 1
    for doc, es in per_doc.items():
        assert len(es) <= ops.TOP_K
        assert [e.rank for e in sorted(es, key=lambda e: e.rank)] == list(
            range(1, len(es) + 1))
        # rank order = (mentions desc, entity asc)
        seq = [(e.mentions, e.entity) for e in sorted(es,
                                                      key=lambda e: e.rank)]
        assert seq == sorted(seq, key=lambda t: (-t[0], t[1]))


def test_entity_resolution_mirrors_reference_candidate_gate(spark, ops):
    """Candidate rule is the reference's English branch
    (entity_resolution.py:166-170): lev <= min(len)//2; merge additionally
    requires shared head word and lev <= MERGE_LEV."""
    rows = ops.entity_resolution(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.entity_a < r.entity_b
        assert r.lev <= min(len(r.entity_a), len(r.entity_b)) // 2
        expect_merged = int(
            r.entity_a.split(" ")[0] == r.entity_b.split(" ")[0]
            and r.lev <= ops.MERGE_LEV)
        assert r.merged == expect_merged


def test_entity_graph_gates(spark, ops):
    e = ops.entity_graph(spark, SF).collect()
    assert e
    n = ops._n_docs(spark, SF)
    for r in e:
        assert r.src < r.dst
        assert r.weight >= ops.MIN_COOC
        assert r.lift_ppm > ops.PPM  # lift > 1 by the integer gate


def test_communities_partition_the_edge_nodes(spark, ops):
    edges = ops.entity_graph(spark, SF).collect()
    nodes = {r.src for r in edges} | {r.dst for r in edges}
    comms = ops.graph_communities(spark, SF).collect()
    members = []
    for c in comms:
        ms = c.members.split(",")
        assert c.size == len(ms)
        assert c.community_id == min(ms)  # canonical = lexicographic min
        members.extend(ms)
    assert sorted(members) == sorted(nodes)  # exact partition, no loss
    # every edge is intra-community (components are closed under edges)
    label = {m: c.community_id for c in comms for m in c.members.split(",")}
    for r in edges:
        assert label[r.src] == label[r.dst]


def test_community_reports_consistency(spark, ops):
    comms = {c.community_id: c for c in
             ops.graph_communities(spark, SF).collect()}
    reps = ops.community_reports(spark, SF).collect()
    assert set(r.community_id for r in reps) == set(comms)
    edges = ops.entity_graph(spark, SF).collect()
    wsum = sum(r.weight for r in edges)
    assert sum(r.weight_total for r in reps) == wsum
    for r in reps:
        assert r.n_entities == comms[r.community_id].size
        assert 1 <= r.rating <= 10
        assert " + " in r.title or r.n_entities == 1
        assert "<->" in r.findings


def test_entity_graph_plan_is_doc_keyed_join(spark, ops):
    """The co-occurrence self-join must be keyed on doc_id — never a
    cartesian/nested-loop over the vocabulary."""
    plan = formatted_plan(ops._graph_edges(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
