"""The north rule's deploy path, exercised for real: package the engine with
scripts/package.py, then run the full pipeline through ``spark-submit
--py-files dist/ontology_pipeline_spark.zip job.py`` in a clean working
directory (only job.py present), so every import the driver and executors
resolve comes from the zip artifact — the exact cluster-deploy shape
(reference deploy analog: serial ``python main.py``, /root/reference
README.md).  Resume semantics are asserted through the same entry point."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    "bin",
    "spark-submit",
)


def _submit(workdir: str, zip_path: str, args: list[str]) -> dict:
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip, not the checkout, must supply the pkg
    env.pop("PYSPARK_GATEWAY_PORT", None)  # not the test session's JVM
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    cmd = [
        SPARK_SUBMIT,
        "--master",
        "local[4]",
        "--conf",
        "spark.ui.enabled=false",
        "--conf",
        "spark.sql.shuffle.partitions=8",
        "--py-files",
        zip_path,
        os.path.join(workdir, "job.py"),
        *args,
    ]
    out = subprocess.run(
        cmd, cwd=workdir, env=env, capture_output=True, text=True, timeout=420
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout}\n{out.stderr}"
    summaries = [
        json.loads(line)
        for line in out.stdout.splitlines()
        if line.startswith("{") and '"new_pages"' in line
    ]
    assert summaries, f"no summary line in stdout:\n{out.stdout}"
    return summaries[-1]


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package import build_zip

    from ontology_pipeline_spark.synth import generate_corpus, pages_df

    zip_path = build_zip(str(tmp_path / "ontology_pipeline_spark.zip"))
    # reproducibility: same tree -> byte-identical artifact
    again = build_zip(str(tmp_path / "again.zip"))
    assert open(zip_path, "rb").read() == open(again, "rb").read()

    corpus = generate_corpus(n_pages=40, seed=23)
    src = str(tmp_path / "pages")
    pages_df(spark, corpus).write.parquet(src)

    workdir = str(tmp_path / "clean_cwd")  # holds ONLY job.py — no package dir
    os.makedirs(workdir)
    shutil.copy(os.path.join(REPO, "job.py"), workdir)
    out_dir = str(tmp_path / "kg")

    s1 = _submit(workdir, zip_path, ["--input", src, "--output", out_dir])
    assert s1["new_pages"] == 40 and s1["new_triples"] > 0

    from ontology_pipeline_spark.plans.pipeline import read_triples

    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in read_triples(spark, out_dir)
        .select("subj", "pred", "obj")
        .distinct()
        .collect()
    }
    want = {(s, p, o) for s, p, o, _u in corpus.expected_triples}
    assert got == want  # P/R == 1.0 through the deploy path

    # resume through the SAME entry point: nothing left to process
    s2 = _submit(workdir, zip_path, ["--input", src, "--output", out_dir])
    assert s2["new_pages"] == 0
