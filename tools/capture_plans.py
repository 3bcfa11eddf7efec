"""Capture .explain("formatted") for named queries into plans/<dir>/<name>_<tag>.txt.

Usage: python tools/capture_plans.py <dir> <tag> <query> [<query> ...]
e.g.   python tools/capture_plans.py r15 before graph_triangle_count
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hiveberg_spark import registry  # noqa: E402
from hiveberg_spark.caching import release_tracked  # noqa: E402
from hiveberg_spark.session import get_spark  # noqa: E402

registry.load_all()

out_dir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="capture-plans")
os.makedirs(os.path.join("plans", out_dir), exist_ok=True)
for name in names:
    df = registry.QUERIES[name](spark, sf)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    path = os.path.join("plans", out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")
    release_tracked()
spark.stop()
