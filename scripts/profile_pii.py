"""Attribute pii_scrub's scale ratio (VERDICT r12 #3, second half).

Decomposes the query wall at a given sf dir into:
  scan  — read documents + the synthetic concat + substring, NO regex
          (everything except the scrub itself)
  full  — the committed q_pii_scrub plan (scan + 2 regexp_replace +
          2 regexp-count aggregates per row)

Both are byte-linear, shuffle-free maps; the decomposition shows the
ratio between scales is plain byte-linearity emerging from under a
fixed session floor, not a super-linear term. A JVM warm-up job runs
first so neither measure carries session start-up.

Usage: python scripts/profile_pii.py /root/testdata/sf0.1 [repeats]
Prints one JSON line per variant (min over repeats).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from reactivedb_spark.functions import text as textfns
    from reactivedb_spark.session import get_spark
    from reactivedb_spark.suite.core import load

    spark = get_spark()
    spark.range(10**6).groupBy((F.col("id") % 7).alias("k")).count().collect()  # warm-up

    def raw(d):
        return d.select(
            "doc_id",
            F.concat(
                F.lit("contact user"), F.col("doc_id").cast("string"),
                F.lit("@example.com or call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" "), F.col("text"),
            ).alias("raw"),
        )

    def scan(d):
        return raw(d).select(
            "doc_id", F.substring("raw", 1, 120).alias("scrubbed"),
            F.length("raw").alias("n_emails"), F.length("raw").alias("n_phones"))

    def full(d):
        r = raw(d)
        n_emails, n_phones = textfns.pii_counts(F.col("raw"))
        return r.select(
            "doc_id",
            F.substring(textfns.scrub_pii(F.col("raw")), 1, 120).alias("scrubbed"),
            n_emails, n_phones)

    d = load(spark, sf, "documents")
    n_bytes = d.select(F.sum(F.length("text"))).collect()[0][0]
    for name, fn in (("scan", scan), ("full", full)):
        walls = []
        for _ in range(repeats):
            t0 = time.monotonic()
            fn(d).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        print(json.dumps({"sf_dir": sf, "variant": name, "walls": walls,
                          "min": min(walls), "text_bytes": int(n_bytes),
                          "load1": round(os.getloadavg()[0], 2)}))


if __name__ == "__main__":
    main()
