"""Round-13 optimization measurement harness.

Usage: python scratch_opt_measure.py [--explain before|after] [--noop] name...

Per named query: warm up at sf0.001, then time min-of-3 at
$SPARK_GRAFT_SF_DIR (default sf0.1) with the bench's count() action
(bench-comparable), or with the noop sink (--noop, guide §1.4 — times
every column of every row). With --explain, also writes
plans/r13/<name>_<tag>.txt containing explain("formatted") of the final
plan. Jobs are labeled (guide §1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    warm_dir = "/root/testdata/sf0.001"

    registry.load_all()
    spark = get_spark(app_name="opt_measure_r13")

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
            os.makedirs("/root/repo/plans/r13", exist_ok=True)
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"/root/repo/plans/r13/{name}_{tag}.txt", "w") as f:
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
