"""Source readers: NDJSON instance validation (reference CLI flow lift),
CSV, format dispatch."""

import json

import pytest

from jsonschema_spark.cli import parse_args, run
from jsonschema_spark.sources.io import read_table, validate_json_lines

SPEC = {
    "required": ["name"],
    "properties": {
        "age": {"minimum": 0, "maximum": 120},
        "name": {"minLength": 1},
    },
}


@pytest.fixture()
def ndjson(tmp_path):
    rows = [
        {"name": "ada", "age": 36},
        {"name": "", "age": 200},          # minLength + maximum
        {"age": 5},                         # required
        {"name": "bob", "age": -1},         # minimum
    ]
    p = tmp_path / "instances.json"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_validate_json_lines(spark, ndjson):
    v = validate_json_lines(spark, ndjson, SPEC, ["name"])
    got = sorted((r["keyword"], r["json_path"]) for r in v.collect())
    assert got == [("maximum", "$.age"), ("minLength", "$.name"),
                   ("minimum", "$.age"), ("required", "$")]


def test_cli_json_input(spark, ndjson, tmp_path):
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(SPEC))
    args = parse_args([str(spec_file), ndjson, "--input-format", "json"])
    assert run(args, spark=spark) == 1


def test_read_table_csv(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_table(spark, str(p), "csv")
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_read_table_bad_format(spark):
    try:
        read_table(spark, "/tmp/x", "avro")
        assert False
    except ValueError as e:
        assert "avro" in str(e)
