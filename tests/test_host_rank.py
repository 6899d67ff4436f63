"""Host-level PageRank (analytics.host_rank): fixed-iteration damped
power iteration with uniform teleport and dangling-mass redistribution,
pinned against an independent pure-Python replay of the same formula on
crafted graphs (cycle, star, dangling sink, weighted edges)."""

import pytest

from htmlx.spark.analytics import host_rank
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-host-rank-test")
    yield s
    s.stop()


def _reference(edges, damping, iters):
    """Independent replay: dict-based power iteration, same semantics."""
    w = {}
    for s, d, wt in edges:
        w[(s, d)] = w.get((s, d), 0.0) + float(wt)
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for (s, _), wt in w.items():
        outw[s] = outw.get(s, 0.0) + wt
    pr = {h: 1.0 / n for h in nodes}
    for _ in range(iters):
        inflow = {h: 0.0 for h in nodes}
        for (s, d), wt in w.items():
            inflow[d] += pr[s] * wt / outw[s]
        dm = sum(pr[h] for h in nodes if h not in outw)
        pr = {
            h: (1.0 - damping) / n + damping * (inflow[h] + dm / n)
            for h in nodes
        }
    return pr


def _run(spark, edges, **kw):
    df = spark.createDataFrame(
        [(s, d) for s, d, _ in edges for _ in range(1)],
        "src_host string, dst_host string",
    )
    return {r["host"]: r["rank"] for r in host_rank(df, **kw).collect()}


def _check(spark, edges, damping=0.85, iters=3):
    got = _run(spark, edges, damping=damping, iters=iters)
    want = _reference(edges, damping, iters)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-12, (h, got[h], want[h])
    # a probability distribution: mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9
    return got


def test_two_node_cycle_is_uniform(spark):
    got = _check(spark, [("a", "b", 1), ("b", "a", 1)])
    assert abs(got["a"] - 0.5) < 1e-12 and abs(got["b"] - 0.5) < 1e-12


def test_star_center_ranks_highest(spark):
    # leaves all link to the hub; hub links back to one leaf
    edges = [("l1", "hub", 1), ("l2", "hub", 1), ("l3", "hub", 1), ("hub", "l1", 1)]
    got = _check(spark, edges)
    assert got["hub"] == max(got.values())
    assert got["l2"] == got["l3"] < got["l1"]


def test_dangling_sink_mass_redistributed(spark):
    # 'sink' has no out-edges: its mass must teleport, not vanish
    _check(spark, [("a", "sink", 1), ("b", "sink", 1), ("a", "b", 1)])


def test_weighted_edges(spark):
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, weight long")
    got = {r["host"]: r["rank"] for r in host_rank(df, weight_col="weight").collect()}
    want = _reference(edges, 0.85, 3)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-12
    assert got["b"] > got["c"]  # 3x the inbound weight from a


def test_iteration_count_matters_and_converges(spark):
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("a", "c", 1)]
    r3 = _check(spark, edges, iters=3)
    r8 = _check(spark, edges, iters=8)
    # power iteration moves toward the fixpoint: successive deltas shrink
    assert any(abs(r3[h] - r8[h]) > 1e-6 for h in r3)


def test_all_catalyst(spark):
    df = spark.createDataFrame([("a", "b")], "src_host string, dst_host string")
    plan = host_rank(df, iters=2)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
