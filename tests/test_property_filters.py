"""Property-based test: filter-combinator algebra vs a brute-force
Python evaluator on randomized small graphs (model: the reference's
randomized uid-list tests, algo/uidlist_test.go)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dgraph_spark.model import Graph
from dgraph_spark.plans import Executor
from dgraph_spark.schema import SchemaRegistry

N_NODES = 12

ages = st.lists(st.integers(0, 5), min_size=N_NODES, max_size=N_NODES)
flags = st.lists(st.booleans(), min_size=N_NODES, max_size=N_NODES)

leaf = st.one_of(
    st.tuples(st.just("age_eq"), st.integers(0, 5)),
    st.tuples(st.just("age_gt"), st.integers(0, 5)),
    st.tuples(st.just("age_le"), st.integers(0, 5)),
    st.tuples(st.just("flag"), st.booleans()),
)
tree = st.recursive(
    leaf,
    lambda sub: st.one_of(
        st.tuples(st.just("and"), sub, sub),
        st.tuples(st.just("or"), sub, sub),
        st.tuples(st.just("not"), sub),
    ),
    max_leaves=6,
)


def to_dql(t) -> str:
    op = t[0]
    if op == "age_eq":
        return f"eq(age, {t[1]})"
    if op == "age_gt":
        return f"gt(age, {t[1]})"
    if op == "age_le":
        return f"le(age, {t[1]})"
    if op == "flag":
        return f"eq(flag, {'true' if t[1] else 'false'})"
    if op == "and":
        return f"({to_dql(t[1])} AND {to_dql(t[2])})"
    if op == "or":
        return f"({to_dql(t[1])} OR {to_dql(t[2])})"
    return f"NOT ({to_dql(t[1])})"


def ref_eval(t, age: int, flag: bool) -> bool:
    op = t[0]
    if op == "age_eq":
        return age == t[1]
    if op == "age_gt":
        return age > t[1]
    if op == "age_le":
        return age <= t[1]
    if op == "flag":
        return flag == t[1]
    if op == "and":
        return ref_eval(t[1], age, flag) and ref_eval(t[2], age, flag)
    if op == "or":
        return ref_eval(t[1], age, flag) or ref_eval(t[2], age, flag)
    return not ref_eval(t[1], age, flag)


@pytest.fixture(scope="module")
def graph_builder(spark):
    reg = SchemaRegistry.parse("age: int @index(int) .\nflag: bool .")

    def build(age_vals, flag_vals):
        preds = {
            "age": spark.createDataFrame(
                list(enumerate(age_vals, start=1)), "subject long, value long"
            ),
            "flag": spark.createDataFrame(
                list(enumerate(flag_vals, start=1)), "subject long, value boolean"
            ),
        }
        return Graph(spark=spark, preds=preds, schema=reg)

    return build


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(age_vals=ages, flag_vals=flags, t=tree)
def test_filter_tree_matches_reference(graph_builder, age_vals, flag_vals, t):
    g = graph_builder(age_vals, flag_vals)
    dql = f"{{ q(func: has(age)) @filter({to_dql(t)}) {{ uid }} }}"
    r = Executor(g).execute(dql)
    got = {int(n["uid"], 16) for n in r["q"]}
    want = {
        i for i, (a, fl) in enumerate(zip(age_vals, flag_vals), start=1)
        if ref_eval(t, a, fl)
    }
    assert got == want
