"""End-to-end curation composition (pipeline.curate)."""

from pyspark.sql import functions as F

from jsonschema_spark import curate


def test_curate_labels_all_three_axes(spark):
    docs = spark.createDataFrame(
        [(1, "the longest surviving text"), (2, "the longest surviving"),
         (3, "unique text"), (4, None)],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    spec = {"type": "object", "required": ["text"]}
    out = curate(docs, spec, "doc_id", pairs=pairs,
                 prefer=-F.length("text"),
                 split={"train": 0.5, "test": 0.5}, split_salt="t")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[4]["valid"] is False and rows[1]["valid"] is True
    # survivor = longest text (doc 1); doc 2 dropped; singletons kept
    assert rows[1]["is_canonical"] and not rows[2]["is_canonical"]
    assert rows[3]["is_canonical"] and rows[4]["is_canonical"]
    assert all(r["split"] in ("train", "test") for r in rows.values())
    # the curated corpus is a plain filter over the labeling
    clean = out.filter("valid AND is_canonical")
    assert {r["doc_id"] for r in clean.collect()} == {1, 3}


def test_curate_without_optional_stages(spark):
    docs = spark.createDataFrame([(1, "a"), (2, None)],
                                 "doc_id long, text string")
    out = curate(docs, {"required": ["text"]}, "doc_id")
    assert out.columns == ["doc_id", "text", "valid"]
    assert {(r["doc_id"], r["valid"]) for r in out.collect()} == \
        {(1, True), (2, False)}


def test_curate_strips_x_spark(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    spec = {"required": ["text"],
            "x-spark": {"unique": ["doc_id"]}}    # must not blow up
    out = curate(docs, spec, "doc_id")
    assert out.collect()[0]["valid"] is True


def test_curate_election_prefers_valid_members(spark):
    """An invalid cluster member must not win the survivor election
    when a valid duplicate exists — otherwise the whole cluster
    vanishes from filter('valid AND is_canonical')."""
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(
        [(1, "the much longer text body", "xx"),   # longer but invalid
         (2, "short text", "en")],                 # valid
        "doc_id long, text string, lang string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    spec = {"properties": {"lang": {"enum": ["en", "de"]}}}
    out = curate(docs, spec, "doc_id", pairs=pairs,
                 prefer=-F.length("text"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["is_canonical"] and not rows[1]["is_canonical"]
    clean = {r["doc_id"] for r in
             out.filter("valid AND is_canonical").collect()}
    assert clean == {2}


def test_curate_nan_free_cluster_keeps_prefer_order(spark):
    """Among all-valid members the user preference still decides."""
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(
        [(1, "short", "en"), (2, "the longest body", "en")],
        "doc_id long, text string, lang string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = curate(docs, {"properties": {"lang": {"enum": ["en"]}}},
                 "doc_id", pairs=pairs, prefer=-F.length("text"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["is_canonical"] and not rows[1]["is_canonical"]


def test_curate_null_prefer_loses_election(spark):
    """A NULL preference value (e.g. -length(NULL text)) must sort
    LAST, not first — otherwise a contentless member wins and real
    content is dropped (matches the SQL oracles' NULLS LAST)."""
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(
        [(1, None), (2, "real text body")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = curate(docs, {}, "doc_id", pairs=pairs,
                 prefer=-F.length("text"))
    rows = {r["doc_id"]: r["is_canonical"] for r in out.collect()}
    assert rows == {1: False, 2: True}


def test_curate_forwards_schema_store(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    spec = {"properties": {"text": {"$ref": "https://x.test/s"}}}
    store = {"https://x.test/s": {"minLength": 2}}
    out = curate(docs, spec, "doc_id", schema_store=store)
    assert out.collect()[0]["valid"] is False
