from dgraph_spark.schema import SchemaRegistry


def test_parse_schema_lines():
    reg = SchemaRegistry.parse("""
    name: string @index(term, exact, trigram) @count @lang .
    friend: [uid] @reverse @count .
    age: int @index(int) .
    user_profile: float32vector @index(hnsw(metric:"euclidean")) .
    type Person { name friend age }
    """)
    name = reg.get("name")
    assert name.typ == "string" and name.lang and name.count
    assert name.indexes == ("term", "exact", "trigram")
    friend = reg.get("friend")
    assert friend.is_uid and friend.list and friend.reverse
    assert reg.get("age").spark_type == "bigint"
    assert reg.get("user_profile").spark_type == "array<float>"
    assert reg.type_preds("Person") == ["name", "friend", "age"]


def test_roundtrip_json():
    reg = SchemaRegistry.parse("name: string @index(exact) .\nfriend: [uid] @reverse .")
    reg2 = SchemaRegistry.from_json(reg.to_json())
    assert reg2.get("friend").reverse
    assert reg2.get("name").indexes == ("exact",)


def test_unknown_pred_defaults():
    reg = SchemaRegistry()
    assert reg.get("mystery").typ == "default"


def test_bigfloat_math_warns_once(spark):
    """bigfloat is narrowed to decimal(38,10) (documented divergence,
    reference types/scalar_types.go:27 is 200-bit): using it in
    value-variable math/aggregation emits ONE warning per predicate."""
    import warnings

    from dgraph_spark import schema as schema_mod
    from dgraph_spark.plans import Executor
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    lines = spark.createDataFrame(
        [('<0x1> <amount> "123.4567890123456789" .',)], "value string")
    g = graph_from_triples(
        spark, parse_nquads(lines),
        SchemaRegistry.parse("amount: bigfloat ."))
    schema_mod._BIGFLOAT_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Executor(g).execute('{ q(func: uid(0x1)) { a as amount } '
                            '  s() { sum(val(a)) } }')
        msgs = [str(x.message) for x in w if "bigfloat" in str(x.message)]
    assert len(msgs) == 1 and "decimal(38,10)" in msgs[0]
    # second run: already warned for this predicate — silent
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        Executor(g).execute('{ q(func: uid(0x1)) { a as amount } '
                            '  s() { sum(val(a)) } }')
        assert not [x for x in w2 if "bigfloat" in str(x.message)]
