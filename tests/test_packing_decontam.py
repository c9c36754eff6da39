"""Sequence packing + benchmark decontamination operators."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neuscraper_spark.operators.curation import decontaminate
from neuscraper_spark.operators.packing import pack_greedy, pack_greedy_py


def test_pack_greedy_respects_budget_and_order(spark):
    rows = [(i, c) for i, c in enumerate([300, 400, 500, 200, 100, 900, 50, 60])]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = pack_greedy(df, budget=700, n_shards=2).collect()
    assert len(out) == len(rows)
    by_bin: dict[tuple[int, int], list] = {}
    for r in out:
        by_bin.setdefault((r.shard, r.seq_id), []).append(r)
    for (_, _), members in by_bin.items():
        total = sum(m.cost for m in members)
        # a bin only exceeds the budget when it holds a single oversized doc
        assert total <= 700 or len(members) == 1
    # within a shard, bin ids are non-decreasing in doc id (greedy order)
    for shard in {r.shard for r in out}:
        ms = sorted((r for r in out if r.shard == shard), key=lambda r: r.id)
        assert all(a.seq_id <= b.seq_id for a, b in zip(ms, ms[1:]))


def test_pack_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(0, 100), (8, 5000), (16, 100)], "doc_id long, n_chars long"
    )  # all shard 0 (n_shards=8)
    out = sorted(pack_greedy(df, budget=1000).collect(), key=lambda r: r.id)
    assert [r.seq_id for r in out] == [0, 1, 2]


@settings(max_examples=25, deadline=None)
@given(
    costs=st.lists(st.integers(min_value=1, max_value=2000), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=3000),
)
def test_pack_py_twin_invariants(costs, budget):
    rows = list(enumerate(costs))
    out = pack_greedy_py(rows, budget, n_shards=4)
    assert len(out) == len(rows)
    fills: dict[tuple[int, int], int] = {}
    counts: dict[tuple[int, int], int] = {}
    for shard, _i, c, seq in out:
        fills[(shard, seq)] = fills.get((shard, seq), 0) + c
        counts[(shard, seq)] = counts.get((shard, seq), 0) + 1
    for k, total in fills.items():
        assert total <= budget or counts[k] == 1


def test_pack_spark_matches_py_twin(spark):
    rows = [(i, (i * 37) % 900 + 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        (r.shard, r.id, r.cost, r.seq_id)
        for r in pack_greedy(df, budget=1024, n_shards=8).collect()
    }
    assert got == set(pack_greedy_py(rows, 1024, n_shards=8))


def test_decontaminate_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "clean words only here nothing shared at all today friend"),
            # contains bench 8-gram "alpha..theta" (case/punct-insensitive)
            (2, "intro Alpha, beta gamma delta epsilon zeta eta THETA outro"),
            (3, "alpha beta gamma"),  # shorter than n=8: no gram, clean
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontaminate(corpus, bench, n=8).collect()}
    assert out[1] == (0, False)
    assert out[2][0] >= 1 and out[2][1] is True
    assert out[3] == (0, False)


def test_decontaminate_broadcasts_benchmark(spark):
    bench = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h i j k")], "doc_id long, text string"
    )
    plan = (
        decontaminate(corpus, bench, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan
