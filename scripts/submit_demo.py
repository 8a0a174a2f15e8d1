"""spark-submit --py-files packaging demo (north_star deployment mode).

Zips the package, writes a thin driver, and launches it via
``spark-submit --py-files`` in a SEPARATE process whose PYTHONPATH does
NOT include this repo — proving workers and driver resolve
``bilies_go_spark`` from the shipped zip alone.  The driver builds a
small index from the deterministic corpus and runs the reference query
set end-to-end.

Usage: python scripts/submit_demo.py [n_convs] [cpus]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER = '''
import sys, tempfile, os
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("bgs-submit-demo")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from bilies_go_spark.corpus import assign_doc_ids, reference_queries, transcripts_df
from bilies_go_spark.operators.index_build import BuildConfig, build_index
from bilies_go_spark.operators.query import QueryEngine

n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
idx = os.path.join(tempfile.mkdtemp(prefix="bgs_submit_"), "index")
corpus = assign_doc_ids(transcripts_df(spark, n_convs))
build_index(spark, corpus, idx, BuildConfig(n_buckets=8))
res = QueryEngine(spark, idx).topk(reference_queries().head(8), mode="distributed")
rows = res.collect()
assert rows, "no results"
print(f"SUBMIT_DEMO_OK rows={len(rows)} top1={rows[0].asDict()}")
'''


def main() -> int:
    n_convs = sys.argv[1] if len(sys.argv) > 1 else "300"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "4"
    from bilies_go_spark.session import package_zip

    zip_path = package_zip()
    work = tempfile.mkdtemp(prefix="bgs_submit_drv_")
    driver_py = os.path.join(work, "driver.py")
    with open(driver_py, "w") as f:
        f.write(DRIVER)
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or ""), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", f"local[{cpus}]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        driver_py,
        n_convs,
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the package
    print("+", " ".join(cmd), file=sys.stderr)
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=600)
    sys.stderr.write(proc.stderr[-2000:])
    print(proc.stdout[-2000:])
    ok = "SUBMIT_DEMO_OK" in proc.stdout
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
