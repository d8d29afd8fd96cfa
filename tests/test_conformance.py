"""Official JSON-Schema-Test-Suite guard: the scalar + applicator +
unevaluated* keyword files must execute with zero failures (skips are
documented data-model deltas, counted but not failures).

Full-suite numbers live in CONFORMANCE.md (tools/run_conformance.py).
"""

import pytest

from jsonschema_spark.conformance import run_suite

FILES = [
    "type.json", "enum.json", "const.json", "minimum.json", "maximum.json",
    "exclusiveMinimum.json", "exclusiveMaximum.json", "multipleOf.json",
    "minLength.json", "maxLength.json", "pattern.json", "required.json",
    "allOf.json", "anyOf.json", "oneOf.json", "not.json",
    "if-then-else.json", "contains.json", "uniqueItems.json",
    "prefixItems.json", "items.json", "boolean_schema.json",
    "unevaluatedItems.json", "unevaluatedProperties.json",
]


@pytest.mark.slow
def test_suite_keyword_files_zero_failures(spark):
    rep = run_suite(spark, "draft2020-12", files=FILES)
    fails = rep.failures()
    assert not fails, [f"{r.file}/{r.case}/{r.test}: {r.reason}"
                       for r in fails[:10]]
    c = rep.counts()
    assert c["pass"] > 500  # the corpus actually executed


@pytest.mark.slow
def test_draft7_legacy_keywords_zero_failures(spark):
    rep = run_suite(spark, "draft7", files=[
        "items.json", "additionalItems.json", "dependencies.json",
        "ref.json", "type.json", "exclusiveMinimum.json",
        "exclusiveMaximum.json"])
    fails = rep.failures()
    assert not fails, [f"{r.file}/{r.case}/{r.test}: {r.reason}"
                       for r in fails[:10]]
    assert rep.counts()["pass"] > 100


@pytest.mark.slow
def test_draft4_boolean_exclusive_zero_failures(spark):
    rep = run_suite(spark, "draft4", files=[
        "minimum.json", "maximum.json", "type.json",
        "dependencies.json"])
    assert not rep.failures()
    assert rep.counts()["pass"] > 40


def test_output_tests_corpus(spark):
    """VERDICT-r3 #2: the official output-tests content suite (basic
    format) passes 100% for both drafts that define it — the engine's
    standard-output object validates against each test's own output
    schema, including RFC 6901-escaped keywordLocations and readOnly
    annotation units."""
    from jsonschema_spark.conformance import run_output_suite
    for draft in ("draft2020-12", "draft2019-09"):
        rep = run_output_suite(spark, draft)
        c = rep.counts()
        assert c["fail"] == 0, rep.failures()
        assert c["pass"] == 4, c


def test_vocabulary_tables_are_era_aware():
    """Regression (r4): 2019-09 places unevaluatedItems/
    unevaluatedProperties in /vocab/applicator (no /vocab/unevaluated
    before 2020-12); applying the 2020-12 vocabulary table to a
    2019-09 meta-schema silently dropped both keywords."""
    from jsonschema_spark.compiler.legacy import apply_vocabulary
    from jsonschema_spark.conformance import (_registry_for_draft,
                                              base_resolver)
    res = base_resolver("draft2019-09")
    reg = _registry_for_draft("draft2019-09")
    schema = {"$schema": "https://json-schema.org/draft/2019-09/schema",
              "unevaluatedItems": False}
    reg2 = apply_vocabulary(reg, schema, res)
    assert reg2.get("unevaluatedItems") is not None
    assert reg2.get("unevaluatedProperties") is not None
    # 2020-12 path unaffected
    res12 = base_resolver("draft2020-12")
    reg12 = apply_vocabulary(
        _registry_for_draft("draft2020-12"),
        {"$schema": "https://json-schema.org/draft/2020-12/schema"}, res12)
    assert reg12.get("unevaluatedProperties") is not None
