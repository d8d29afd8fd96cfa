"""End-to-end `spark-submit --py-files` smoke — the north_rule's
submission clause exercised for real: the package zip built by
tools/package.py is the ONLY import source (cwd is a temp dir, repo not
on PYTHONPATH), the driver script is the CLI entry, the job validates a
real testdata parquet table and writes violations + manifest."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_py_files_job(tmp_path):
    # 1. build the --py-files artifact
    out = subprocess.run([sys.executable,
                          os.path.join(REPO, "tools", "package.py")],
                         capture_output=True, text=True, check=True)
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    # 2. driver script + spec staged OUTSIDE the repo
    launcher = tmp_path / "job.py"
    launcher.write_text(
        "import sys\n"
        "from jsonschema_spark.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n")
    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({
        "required": ["o_orderkey"],
        "properties": {"o_totalprice": {"maximum": 100000},
                       "o_orderstatus": {"enum": ["O", "F", "P"]}},
    }))
    outdir = tmp_path / "report"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)        # the zip must be the import source
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.sql.ansi.enabled=false",
         "--py-files", zip_path,
         str(launcher), str(spec),
         "/root/testdata/sf0.001/orders.parquet",
         "--id-cols", "o_orderkey",
         "--partition-by", "o_orderstatus",
         "--out", str(outdir)],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert proc.returncode == 1, proc.stderr[-3000:]   # violations -> exit 1
    # spark-submit interleaves the driver's streams with its own logs;
    # just require the summary line somewhere
    assert "rows valid" in proc.stdout + proc.stderr

    # 3. the report landed: manifest sums to the table size
    viol = outdir / "violations"
    man = outdir / "manifest"
    assert (viol / "_SUCCESS").exists() and (man / "_SUCCESS").exists()
    import duckdb
    con = duckdb.connect()
    total = con.execute(
        f"SELECT sum(rows) FROM read_parquet('{man}/*.parquet')"
    ).fetchone()[0]
    assert total == 1500
    nv = con.execute(
        f"SELECT count(*) FROM read_parquet('{viol}/*.parquet')"
    ).fetchone()[0]
    assert nv > 0
