"""Deployment-shape integration test: the north rule mandates running
via ``spark-submit --py-files`` on a cluster. This test proves the
actual contract end-to-end in a fresh process:

- the package ships as a zip (--py-files), NOT via the repo checkout:
  the entrypoint script is COPIED to a temp directory and executed from
  a cwd outside the repo, so any accidental repo-relative dependency
  fails loudly;
- the job runs splits-mode encode on a real tokens parquet, prints the
  one-line JSON metrics contract, and the written blobs decode back to
  the input exactly.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_deployment(spark, tmp_path):
    # tokens input (written with the repo checkout; the SUBMITTED job
    # only sees the zip)
    from orc_format_spark import tokenize_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = tokenize_documents(docs)
    inp = str(tmp_path / "tokens")
    toks.repartition(2).write.parquet(inp)
    want_rows = toks.count()

    zpath = str(tmp_path / "orc_format_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "orc_format_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    script = str(tmp_path / "encode_job.py")
    shutil.copy(os.path.join(REPO, "scripts", "encode_job.py"), script)
    out = str(tmp_path / "out")

    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith("PYTHONPATH")  # nothing repo-local leaks in
    }
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zpath,
            script,
            "--input",
            inp,
            "--output",
            out,
            "--mode",
            "splits",
        ],
        cwd=str(tmp_path),  # NOT the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics["n_rows"] == want_rows
    assert metrics["output_bytes"] > 0

    # the blobs the submitted job wrote decode to the exact input
    from orc_format_spark import decode_blobs

    blobs = spark.read.parquet(f"{out}/blobs")
    back = decode_blobs(blobs, ", ".join(f"{c} {t}" for c, t in toks.dtypes))
    assert back.count() == want_rows
    a = sorted(map(tuple, back.select("doc_id", "n_tok").collect()))
    b = sorted(map(tuple, toks.select("doc_id", "n_tok").collect()))
    assert a == b
