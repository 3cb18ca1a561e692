#!/usr/bin/env bash
# Deployment smoke: package the library, then drive BOTH service entries
# from the packaged form through deploy/spark-submit.sh —
#   1. graft.TestConfig validates the service config
#   2. graft.Run streams a file-input pipeline to jsonl, serving
#      /metrics + /health while running (the chart's probe surface)
#   3. graft.Curate runs a batch curation config over real testdata
# Exits non-zero on any failure. Requires: sbt, a Spark dist at
# $SPARK_HOME (default /opt/spark), python3.
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=$(mktemp -d /tmp/graft-smoke.XXXXXX)
RUN_PID=""
cleanup() {
  [ -n "$RUN_PID" ] && kill "$RUN_PID" 2>/dev/null || true
  # the JVM may outlive the submit wrapper
  pkill -f "graft.Run $WORK/config.yml" 2>/dev/null || true
  rm -rf "$WORK"
}
trap cleanup EXIT
echo "== smoke workdir: $WORK"

echo "== sbt package"
sbt -batch package > "$WORK/package.log" 2>&1 || { tail -20 "$WORK/package.log"; exit 1; }
JAR=$(ls -t target/scala-2.13/*.jar | head -1)
echo "   jar: $JAR"

mkdir -p "$WORK/in" "$WORK/out" "$WORK/ckpt"
cat > "$WORK/config.yml" <<EOF
input:
  files:
    type: file_input
    path: $WORK/in
output:
  sink:
    type: jsonl_output
    path: $WORK/out
    channel: main
pipeline:
  - type: dissector
    rules:
      - filter: message
        dissector:
          mapping:
            message: "%{level} %{text}"
metrics:
  enabled: true
  port: 18200
  bind: 127.0.0.1
checkpoint: $WORK/ckpt
trigger: processing=1 second
EOF

echo "== 1. test-config validates the service pipeline"
deploy/spark-submit.sh test-config "$WORK/config.yml" > "$WORK/testcfg.log" 2>&1 \
  || { tail -5 "$WORK/testcfg.log"; exit 1; }
grep -q "successful" "$WORK/testcfg.log" && echo "   OK"

echo "== 2. graft.Run: stream file -> jsonl, probe /health + /metrics"
printf 'INFO hello\nWARN disk\n' > "$WORK/in/a.log"
deploy/spark-submit.sh run "$WORK/config.yml" > "$WORK/run.log" 2>&1 &
RUN_PID=$!
HEALTH=""
for _ in $(seq 1 60); do
  sleep 2
  HEALTH=$(curl -sf http://127.0.0.1:18200/health 2>/dev/null || true)
  [ "$HEALTH" = "OK" ] && break
done
[ "$HEALTH" = "OK" ] || { echo "health endpoint never came up"; tail -20 "$WORK/run.log"; kill $RUN_PID; exit 1; }
echo "   /health: $HEALTH"
# wait for the micro-batch to land, then check output + metrics
ROWS=0
for _ in $(seq 1 30); do
  sleep 2
  ROWS=$( (cat "$WORK/out"/*.json 2>/dev/null || true) | wc -l )
  [ "$ROWS" -ge 2 ] && break
done
[ "$ROWS" -ge 2 ] || { echo "no output rows"; tail -20 "$WORK/run.log"; kill $RUN_PID; exit 1; }
grep -q '"level":"INFO"' "$WORK/out"/*.json || { echo "dissector output missing"; kill $RUN_PID; exit 1; }
curl -sf http://127.0.0.1:18200/metrics | grep -q "graft_" \
  && echo "   /metrics: graft_ counters exported"
echo "   output rows: $ROWS"
kill $RUN_PID 2>/dev/null || true; wait $RUN_PID 2>/dev/null || true; RUN_PID=""

echo "== 3. graft.Curate: batch curation over sf0.001 documents"
cat > "$WORK/curation.yml" <<EOF
pipeline:
  - type: quality_signals
    text_field: text
  - type: dedup_exact
    text_field: text
    id_field: doc_id
EOF
deploy/spark-submit.sh curate "$WORK/curation.yml" \
  /root/testdata/sf0.001/documents.parquet "$WORK/curated" \
  > "$WORK/curate.log" 2>&1 || { tail -20 "$WORK/curate.log"; exit 1; }
python3 - "$WORK/curated" <<'PY'
import sys
import duckdb
n = duckdb.connect().execute(
    f"SELECT count(*) FROM read_parquet('{sys.argv[1]}/data/*.parquet')").fetchone()[0]
assert n > 0, "curated output is empty"
print(f"   curated rows: {n}")
PY

echo "== smoke PASSED"
