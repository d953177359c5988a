"""Property-based invariants (hypothesis) for the operators whose
correctness arguments are structural: connected-components path
equivalence on random graphs and chunking coverage/size bounds on
random token streams.

Example counts are deliberately small — each example runs Spark jobs —
but random structure covers shapes (cycles, stars, isolated chains,
ragged tails) that the hand-written fixtures don't.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from zdb_spark.operators import dedup
from zdb_spark.operators.curation import chunk_documents

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _reference_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Plain-python reference: min-member label per component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {n: find(n) for n in parent}


@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda p: p[0] != p[1]),
    min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_cluster_paths_agree_on_random_graphs(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges],
        "id_a long, id_b long").dropDuplicates()
    want = _reference_components(edges)
    fast = {r["doc_id"]: r["cluster_id"] for r in
            dedup.duplicate_clusters(pairs).collect()}
    dist = {r["doc_id"]: r["cluster_id"] for r in
            dedup.duplicate_clusters(pairs, driver_threshold=0).collect()}
    assert fast == want
    assert dist == want


@given(st.lists(st.integers(1, 8), min_size=1, max_size=60),
       st.integers(2, 12), st.integers(0, 5))
@settings(**_SETTINGS)
def test_chunk_coverage_and_bounds(spark, word_lens, max_tokens, overlap):
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    words = [f"w{i}x" * L for i, L in enumerate(word_lens)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    out = sorted(
        chunk_documents(df, "text", "doc_id",
                        max_tokens=max_tokens, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"])
    # chunk ids are dense from 0; sizes bounded; every token covered in
    # order; consecutive chunks share exactly `overlap` tokens except at
    # the tail
    assert [r["chunk_idx"] for r in out] == list(range(len(out)))
    stride = max_tokens - overlap
    seen: list[str] = []
    for i, r in enumerate(out):
        toks = r["chunk_text"].split()
        assert 1 <= len(toks) <= max_tokens
        assert r["n_chunk_tokens"] == len(toks)
        assert toks == [w.lower() for w in
                        words[i * stride:i * stride + len(toks)]]
        seen = seen[:i * stride] + toks
    assert seen == [w.lower() for w in words]


@given(st.lists(
    st.tuples(st.integers(0, 8),          # user
              st.sampled_from(["a", "b", "c"]),
              st.integers(0, 50)),        # ts
    min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_funnel_users_monotone_and_bounded(spark, events):
    """Structural invariants on random event streams: qualifying USERS
    never increase along the funnel (a step-i+1 user must have qualified
    at step i), and each step's event count is bounded by that step
    type's distinct (user, ts) events.  (Event counts are NOT monotone:
    one anchor can qualify many later events — which random streams
    exercise.)"""
    from zdb_spark.operators.temporal import funnel

    df = spark.createDataFrame(events,
                               "user_id long, event_type string, ts long")
    out = {r["step_idx"]: r for r in
           funnel(df, ["a", "b", "c"], "ts", "user_id",
                  within=20).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1]["n_users"] <= out[0]["n_users"]
    assert out[2]["n_users"] <= out[1]["n_users"]
    for i, step in enumerate(["a", "b", "c"]):
        cap = (df.where(F.col("event_type") == step)
               .select("user_id", "ts").distinct().count())
        assert out[i]["n_events"] <= cap
        assert out[i]["n_users"] <= cap
