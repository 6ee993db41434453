#!/usr/bin/env bash
# Two-cluster-size scaling evidence (north rule: throughput scaling
# efficiency >= 0.8 from N to 4N executors). No real cluster in this
# sandbox, so we run the SAME spark-submit replay job on the SAME
# pre-generated event log at local[8] and local[32] and compare
# events/sec. Results land in BENCH/BASELINE.md (via scripts/scale_report.py).
#
# Usage: scripts/scale_bench.sh [N_EVENTS] [N_KEYS]
set -euo pipefail
cd "$(dirname "$0")/.."

N_EVENTS="${1:-2000000}"
N_KEYS="${2:-200000}"
WORK="${SCALE_BENCH_WORK:-/tmp/pyspark_cdc_scale}"
rm -rf "$WORK"; mkdir -p "$WORK"

zip -qr "$WORK/pyspark_cdc.zip" pyspark_cdc

# generate ONE log, reused by both runs (identical input)
python - <<EOF
from pyspark.sql import SparkSession
from pyspark_cdc import generate
spark = (SparkSession.builder.master("local[32]").appName("gen")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false").getOrCreate())
generate.write_log(spark, "$WORK/log", n_events=$N_EVENTS, n_keys=$N_KEYS,
                   n_files=64, hot_pct=30, include_edge_cases=False)
spark.stop()
EOF

run() {  # run <cores> <tag>
  local cores="$1" tag="$2"
  rm -rf "$WORK/lake_$tag" "$WORK/ckpt_$tag"
  spark-submit --master "local[$cores]" \
    --conf spark.driver.memory=24g \
    --conf spark.sql.shuffle.partitions="$cores" \
    --conf spark.ui.enabled=false \
    --py-files "$WORK/pyspark_cdc.zip" \
    jobs/replay.py --log-dir "$WORK/log" --table-dir "$WORK/lake_$tag" \
    --mode batch --n-buckets 64 --runs 3 \
    2>"$WORK/submit_$tag.err" | tail -1 > "$WORK/result_$tag.json"
  echo "local[$cores]: $(cat "$WORK/result_$tag.json")"
}

run 8 n8
run 32 n32

python scripts/scale_report.py "$WORK/result_n8.json" "$WORK/result_n32.json" "$N_EVENTS"
