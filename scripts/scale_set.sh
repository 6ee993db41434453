#!/usr/bin/env bash
# One single-pass coherent scaling run set: 1N, 2N, 4N executors back to
# back over the same pre-generated log (generated on first use, reused
# afterwards). This is the "coherent set" variant of scale_bench.sh used
# for run sets s12+ — minimal wall-clock exposure (~8 min) so the whole
# set fits inside one of the shared host's clean bursts, at the cost of
# no best-of-2 noise rejection within the set.
#
# Usage: scripts/scale_set.sh <tag> [N_EVENTS] [N_KEYS]
#   tag: label stamped into the result line (e.g. s17a)
# Output: per-leg JSON lines + a summary line, suitable for
#   BENCH/scale_sweeps_r04/set<tag>.out
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${1:?usage: scale_set.sh <tag> [N_EVENTS] [N_KEYS]}"
N_EVENTS="${2:-16000000}"
N_KEYS="${3:-1600000}"
WORK="${SCALE_BENCH_WORK:-/tmp/pyspark_cdc_scale}"
mkdir -p "$WORK"

# log dir keyed on the requested size: a reused log of a DIFFERENT
# n_events/n_keys would silently benchmark stale data (round-4 advice)
LOG="$WORK/log_${N_EVENTS}_${N_KEYS}"

zip -qr "$WORK/pyspark_cdc.zip" pyspark_cdc

[ -d "$LOG" ] || python - <<EOF
from pyspark.sql import SparkSession
from pyspark_cdc import generate
spark = (SparkSession.builder.master("local[32]").appName("gen")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false").getOrCreate())
generate.write_log(spark, "$LOG", n_events=$N_EVENTS, n_keys=$N_KEYS,
                   n_files=256, hot_pct=30, include_edge_cases=False)
spark.stop()
EOF

CORES_PER_EXEC=4
MEM_PER_EXEC=16384

run() {  # run <n_executors> <tag>
  local nexec="$1" tag="$2"
  local cores=$((nexec * CORES_PER_EXEC))
  rm -rf "$WORK/lake_$tag" "$WORK/ckpt_$tag" "$WORK/metrics_$tag"
  spark-submit --master "local-cluster[$nexec,$CORES_PER_EXEC,$MEM_PER_EXEC]" \
    --conf spark.driver.memory=8g \
    --conf spark.executor.memory=14g \
    --conf spark.sql.shuffle.partitions="$cores" \
    --conf spark.sql.files.maxPartitionBytes=4194304 \
    --conf spark.ui.enabled=false \
    --py-files "$WORK/pyspark_cdc.zip" \
    jobs/replay.py --log-dir "$LOG" --table-dir "$WORK/lake_$tag" \
    --mode stream --checkpoint "$WORK/ckpt_$tag" \
    --metrics-dir "$WORK/metrics_$tag" \
    --max-files-per-trigger 32 --n-buckets 64 --probe-stamps \
    2>"$WORK/submit_$tag.err" | tail -1 > "$WORK/result_$tag.json"
  echo "$nexec executors x $CORES_PER_EXEC cores: $(cat "$WORK/result_$tag.json")"
}

run 1 "${TAG}_n1"
run 2 "${TAG}_n2"
run 4 "${TAG}_n4"

SCALE_SET_TAG="$TAG" SCALE_BENCH_WORK="$WORK" python - <<'PYEOF'
import json, os
work = os.environ["SCALE_BENCH_WORK"]
tag = os.environ["SCALE_SET_TAG"]
tp = {}
for n in (1, 2, 4):
    with open(f"{work}/result_{tag}_n{n}.json") as f:
        r = json.load(f)
    tp[str(n)] = r["merge"].get("sustained_events_per_sec") or r["events_per_sec"]
eff2 = round(tp["2"] / tp["1"] / 2, 3)
eff4 = round(tp["4"] / tp["1"] / 4, 3)
print(json.dumps({"set": tag, "throughputs": tp, "eff_2n": eff2, "eff_4n": eff4}))
PYEOF
