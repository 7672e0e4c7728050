"""Multi-JVM executor mode (scripts/cluster_scaling.py's transport):
the engine must run when executors are SEPARATE JVMs that resolve
``feast_spark`` from a shipped zip, not from the driver's filesystem
path. Runs in a subprocess (the session-scoped local[8] fixture owns
this process's JVM; getOrCreate would silently reuse it)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = r"""
import json, sys
from feast_spark.session import get_spark
from scripts.submit_pipeline import build_zip

spark = get_spark("lc_test", cpus=2, master="local-cluster[2,1,1024]",
                  extra_conf={"spark.driver.memory": "2g"})
spark.sparkContext.addPyFile(build_zip(%(repo)r))

# a pandas-UDF pass whose closure imports feast_spark INSIDE the
# executor python worker - fails unless the zip actually shipped
def score(batches):
    from feast_spark import rules  # resolved from the shipped zip
    import pandas as pd
    cfg = rules.RuleConfig()
    for pdf in batches:
        out = rules.score_turns(pdf["text"], cfg)
        yield pd.DataFrame({"id": pdf["id"], "keep": out["keep"]})

df = spark.range(200).selectExpr(
    "id", "concat('the quick brown fox jumps over the lazy dog ', id) AS text")
got = df.repartition(4).mapInPandas(score, "id long, keep boolean")
n = got.count()
execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
print(json.dumps({"rows": n, "jvm_endpoints": execs}))
spark.stop()
"""


def test_engine_runs_on_separate_executor_jvms():
    out = subprocess.run(
        [sys.executable, "-c", _JOB % {"repo": REPO}],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "PYTHONPATH": REPO,
             "PYSPARK_PYTHON": sys.executable},
    )
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert out.returncode == 0 and lines, out.stderr[-800:]
    got = json.loads(lines[-1])
    assert got["rows"] == 200
    # 2 executors + driver = 3 JVM endpoints: genuinely multi-process
    assert got["jvm_endpoints"] == 3
