"""The north_rule's deployment shape: `spark-submit --py-files brl.zip`
must run the full linkage job with the library supplied ONLY via the zip
(no repo on PYTHONPATH) — proves executor-side importability of the
applyInPandas solver functions."""

import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(spark, tmp_path):
    from bayesianrecordlinkage_jl_spark.sources.pages import generate_pages

    inp = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    generate_pages(spark, n_clusters=60).select(
        "url", "warc_ts", "html", "text", "lang"
    ).write.parquet(inp)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_path.endswith("brl.zip") and os.path.exists(zip_path)

    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(sys.executable)), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # library must come from --py-files alone
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    run = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_linkage.py"),
            inp, out,
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=480,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    assert "linkage done:" in run.stdout
    clusters = spark.read.parquet(f"{out}/clusters")
    assert clusters.count() > 0
    assert set(clusters.columns) == {"url", "node", "cluster_id"}
