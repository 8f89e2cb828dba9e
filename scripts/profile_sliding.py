"""Per-batch timing experiment for streaming_sliding vs streaming_tumbling,
calm vs induced host load (VERDICT r7 #3 evidence)."""
import json
import os
import subprocess
import sys
import time

os.environ["RDB_STREAM_PROF"] = sys.argv[2] if len(sys.argv) > 2 else "/tmp/slideprof/prof.jsonl"
sys.path.insert(0, "/root/repo")

MODE = sys.argv[1] if len(sys.argv) > 1 else "calm"
SPIN = 24 if MODE == "load" else 0

spinners = []
for _ in range(SPIN):
    spinners.append(subprocess.Popen(
        [sys.executable, "-c", "while True: pass"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))

try:
    from reactivedb_spark.session import get_spark
    spark = get_spark("slideprof", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()
    from reactivedb_spark.suite.analytics import q_streaming_tumbling
    from reactivedb_spark.suite.pipeline import q_streaming_sliding

    for name, fn in (("sliding", q_streaming_sliding),
                     ("tumbling", q_streaming_tumbling)):
        for rep in range(3):
            t0 = time.perf_counter()
            df = fn(spark, "/root/testdata/sf0.1")
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            print(json.dumps({"mode": MODE, "q": name, "rep": rep,
                              "wall": round(wall, 2),
                              "load1": round(os.getloadavg()[0], 1)}),
                  flush=True)
finally:
    for p in spinners:
        p.kill()
