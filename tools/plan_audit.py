"""Plan-shape audit over every declared query: flags plan anti-patterns."""
import sys, os, json, re, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hiveberg_spark.session import get_spark
from hiveberg_spark import registry
registry.load_all()
from hiveberg_spark.caching import release_tracked
spark = get_spark()
sf = "/root/testdata/sf0.001"
out = {}
for name, fn in sorted(registry.QUERIES.items()):
    t0 = time.perf_counter()
    try:
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        rec = {
            "exchanges": len(re.findall(r"\bExchange ", plan)),
            "single_part": len(re.findall(r"Exchange SinglePartition", plan)),
            "batch_eval_py": len(re.findall(r"BatchEvalPython", plan)),
            "arrow_eval_py": len(re.findall(r"ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "bnl_join": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "window_nodes": len(re.findall(r"\bWindow\b", plan)),
            "scans_no_pushed": len(re.findall(r"PushedFilters: \[\](?!.*ReadSchema: struct<>)", plan)),
            "construct_s": round(time.perf_counter() - t0, 2),
        }
        out[name] = rec
    except Exception as e:
        out[name] = {"err": repr(e)[:120]}
    finally:
        release_tracked()
_out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r15/plan_audit.json"
json.dump(out, open(_out_path, "w"), indent=1)
print("done", len(out))
spark.stop()
