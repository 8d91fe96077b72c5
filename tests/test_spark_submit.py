"""Packaging smoke test: the north rule's launch mode is
``spark-submit --py-files`` (BASELINE.json); this proves the package
zips and runs a real crawl in a fresh spark-submit process whose
imports come from the zip, NOT the repo working directory.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
import go_crawler_spark
from go_crawler_spark.crawl import Crawler, CrawlConfig
from go_crawler_spark import fixtures

pages = fixtures.golden_pages(spark)
cr = Crawler(spark, sys.argv[1], pages, CrawlConfig(max_iterations=4, bloom_buckets=4))
cr.run(seed_urls=["http://srv1.test", "http://srv2.test"])
urls = sorted(r.url for r in cr.read_frontier().select("url").collect())
docs = cr.read_documents().count()
print("SUBMIT_RESULT " + json.dumps(
    {"urls": urls, "docs": docs, "pkg": go_crawler_spark.__file__}))
spark.stop()
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files_crawl(tmp_path):
    pkg_zip = str(tmp_path / "go_crawler_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "go_crawler_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    wh = str(tmp_path / "wh")

    # cwd OUTSIDE the repo + scrubbed PYTHONPATH: imports must resolve
    # from the --py-files zip or the run fails
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", pkg_zip,
            str(driver), wh,
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    result = None
    for line in out.stdout.splitlines():
        if line.startswith("SUBMIT_RESULT "):
            result = json.loads(line[len("SUBMIT_RESULT "):])
    assert result is not None, f"no result line\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    # the exact golden-web link set (crawler_integration_test.go:75-81)
    assert result["urls"] == sorted(
        [
            "http://srv1.test",
            "http://srv2.test",
            "http://google.com/absolute/path",
            "http://google.com/relative",
            "http://google.com/ignore-me",
        ]
    )
    assert result["docs"] == 2
    assert "go_crawler_spark.zip" in result["pkg"]  # imported from the zip
