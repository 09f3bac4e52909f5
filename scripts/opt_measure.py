"""Optimization measurement harness (rounds 13+).

Usage: python scripts/opt_measure.py [--explain before|after] [--noop] name...

Per named query: warm up at sf0.001, then time min-of-3 at
$SPARK_GRAFT_SF_DIR (default sf0.1) with the bench's count() action
(bench-comparable), or with the noop sink (--noop, guide §1.4 — times
every column of every row). With --explain, also writes
$SPARK_GRAFT_PLANS_DIR/<name>_<tag>.txt (default plans/r14) containing
explain("formatted") of the final plan. Jobs are labeled (guide §1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from node_cdc_nats_spark import registry
from node_cdc_nats_spark.cache import release_persisted
from node_cdc_nats_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    tag = None
    if "--explain" in args:
        i = args.index("--explain")
        tag = args[i + 1]
        del args[i : i + 2]
    use_noop = "--noop" in args
    if use_noop:
        args.remove("--noop")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")

    registry.load_all()
    spark = get_spark(app_name="opt_measure")

    def run(df):
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    print(f"loadavg: {[round(v, 2) for v in os.getloadavg()]}", flush=True)
    results = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        try:
            run(fn(spark, warm_dir))
        except Exception as e:
            print(f"warmup {name}: {type(e).__name__}: {e}", flush=True)
        release_persisted()
        if tag:
            plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"))
            os.makedirs(plans_dir, exist_ok=True)
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            release_persisted()
        best = None
        for i in range(3):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            run(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        release_persisted()
        results[name] = round(best, 3)
        print(f"{name}: {best:.3f}s (min of 3)", flush=True)
    print("RESULTS", results, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
