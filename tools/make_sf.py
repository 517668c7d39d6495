"""Deterministically scale a test-data directory up K× so the bench
can run at sf1 (or higher), where data-bound cost dominates the fixed
driver/planning share and core-count scaling is measurable (r11
verdict: at sf0.1 every query is sub-second and the 32-vs-8-core
ratios are pure noise).

The driver's tables are read-only and its generator is not available,
so sf1 is derived from sf0.1: K copies of every fact table, copy 0
verbatim, copy c>0 with keys offset by c*OFFSET. Structure matters
more than size here — a naive K× replication would make every row an
exact cross-copy duplicate and blow the dedup/similarity queries up
quadratically (each LSH bucket gets K× members → K² pairs), which is
NOT what a bigger corpus looks like. So:

- OFFSET = 12,000,000 is divisible by lcm(5,8,10,24,100)=600, so the
  small-mod derivations queries apply to ids (severity = id%8,
  app = user%5, ...) keep their distribution in every copy, and all
  cross-table key references (orders→customer, lineitem→orders/part/
  supplier) stay consistent because both sides shift by the same
  amount.
- documents.text gets a per-copy token suffix (every token of copy c
  becomes token||c): zero cross-copy shingle overlap, while all
  WITHIN-copy dup/near-dup relations are preserved exactly. n_chars
  is recomputed.
- embeddings.embedding is cyclically rotated by (7*c) mod dim per
  copy: a rotation is orthogonal, so every within-copy cosine
  similarity is preserved exactly while cross-copy vectors decohere.
- region/nation stay as-is (dimensions don't scale, as in TPC-H).

Usage:
  python tools/make_sf.py [--src /root/testdata/sf0.1] [--mult 10] \
                          [--dest /tmp/rsyslog_spark_sf1]
Then: SPARK_GRAFT_SF_DIR=/tmp/rsyslog_spark_sf1/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rsyslog_spark import get_spark

OFFSET = 12_000_000

#: id (bigint) columns to shift per copy, per table
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def one_copy(df: DataFrame, table: str, c: int) -> DataFrame:
    if c:
        for col in SHIFT[table]:
            df = df.withColumn(col, F.col(col) + F.lit(c * OFFSET))
    if table == "documents" and c:
        remixed = F.array_join(
            F.transform(F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(t, F.lit(str(c)))), " ")
        df = (df.withColumn("text", remixed)
              .withColumn("n_chars", F.length("text")))
    if table == "embeddings" and c:
        dim = F.size("embedding")
        s = F.lit(7 * c) % dim
        df = df.withColumn(
            "embedding",
            F.concat(F.slice("embedding", s + 1, dim - s),
                     F.slice("embedding", F.lit(1), s)))
    return df


def main() -> int:
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    src = opt("--src", "/root/testdata/sf0.1")
    mult = int(opt("--mult", "10"))
    src_sf = float(os.path.basename(src.rstrip("/")).replace("sf", ""))
    dest_root = opt("--dest", "/tmp/rsyslog_spark_sf1")
    sf_name = f"sf{src_sf * mult:g}"
    dest = os.path.join(dest_root, sf_name)

    spark = get_spark("make_sf")
    spark.sparkContext.setLogLevel("ERROR")
    # driver testdata carries TIMESTAMP(NANOS) in some columns
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for table in COPY_AS_IS:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        df.coalesce(1).write.mode("overwrite") \
            .parquet(f"{dest}/{table}.parquet")
        print(f"{table}: copied as-is", flush=True)
    for table in SHIFT:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        out = one_copy(df, table, 0)
        for c in range(1, mult):
            out = out.unionByName(one_copy(df, table, c))
        # 32 files per table ≈ one split per local core; plenty of
        # parallelism without a small-files problem (guide §6)
        (out.repartition(32).write.mode("overwrite")
         .parquet(f"{dest}/{table}.parquet"))
        n = spark.read.parquet(f"{dest}/{table}.parquet").count()
        print(f"{table}: {n} rows ({mult}x)", flush=True)
    print(f"done -> {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
