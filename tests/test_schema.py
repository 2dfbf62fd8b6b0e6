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
