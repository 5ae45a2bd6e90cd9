"""Metric math parity tests (reference: recall_harness/metrics.rs unit tests)."""

import math

from shodh_tpu.harness.metrics import (
    Metrics,
    aggregate,
    average_precision,
    mrr,
    ndcg_at_k,
    p_at_1,
    precision_at_k,
    recall_at_k,
)


def test_empty_inputs_are_zero():
    assert precision_at_k([], {"a"}, 10) == 0.0
    assert recall_at_k(["a"], set(), 10) == 0.0
    assert mrr([], {"a"}) == 0.0
    assert p_at_1([], {"a"}) == 0.0
    assert average_precision([], {"a"}) == 0.0
    assert ndcg_at_k([], {"a": 1.0}, 10) == 0.0
    assert precision_at_k(["a"], {"a"}, 0) == 0.0


def test_precision_uses_k_denominator():
    # TREC convention: short lists are penalised.
    assert precision_at_k(["a"], {"a"}, 10) == 0.1
    assert precision_at_k(["a", "b"], {"a", "b"}, 2) == 1.0


def test_recall_at_k():
    assert recall_at_k(["a", "x", "b"], {"a", "b", "c"}, 10) == 2 / 3
    assert recall_at_k(["a", "x", "b"], {"a", "b", "c"}, 2) == 1 / 3


def test_mrr_and_p1():
    assert mrr(["x", "a"], {"a"}) == 0.5
    assert mrr(["x", "y"], {"a"}) == 0.0
    assert p_at_1(["a", "x"], {"a"}) == 1.0
    assert p_at_1(["x", "a"], {"a"}) == 0.0


def test_map_trec_definition():
    # relevant at ranks 1 and 3: AP = (1/2) * (1/1 + 2/3)
    assert math.isclose(average_precision(["a", "x", "b"], {"a", "b"}), 0.5 * (1 + 2 / 3))
    # unfound relevant docs count in the denominator
    assert math.isclose(average_precision(["a"], {"a", "b"}), 0.5)


def test_ndcg_graded():
    # perfect ordering of graded relevance -> 1.0
    rel = {"a": 3.0, "b": 1.0}
    assert math.isclose(ndcg_at_k(["a", "b"], rel, 10), 1.0)
    # swapped order scores less than 1
    v = ndcg_at_k(["b", "a"], rel, 10)
    assert 0.0 < v < 1.0
    # negative grades are clamped
    assert ndcg_at_k(["a"], {"a": -1.0}, 10) == 0.0


def test_compute_and_aggregate():
    m = Metrics.compute(["a", "x"], {"a": 2.0}, k=10)
    assert m.p_at_1 == 1.0 and m.recall_at_k == 1.0
    agg = aggregate([m, Metrics()], k=10)
    assert agg["p@1"] == 0.5
    assert agg["recall@10"] == 0.5


def test_fixture_loading():
    from shodh_tpu.harness.fixtures import load_cases, load_corpus

    corpus = load_corpus("tests/recall/corpora/shodh-smoke.jsonl")
    cases = load_cases("tests/recall/smoke_cases.jsonl")
    assert len(corpus) == 80
    assert len(cases) == 108
    assert corpus[0].symbolic_id == "ssm-001"
    assert cases[0].relevance == {"ssm-001": 3.0}
    cats = {c.category for c in cases}
    assert cats == {"code", "decision", "entity", "multi_hop", "negation", "temporal"}
