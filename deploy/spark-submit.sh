#!/usr/bin/env bash
# Launch a graft entry point through spark-submit — the deployment path
# for a real cluster (mirrors the reference's `logprep run config.yml`
# container entry; see deploy/README.md).
#
#   deploy/spark-submit.sh run    /etc/graft/config.yml
#   deploy/spark-submit.sh curate /etc/graft/curation.yml s3a://in/docs s3a://out/clean
#   deploy/spark-submit.sh test-config /etc/graft/config.yml
#
# Environment:
#   SPARK_HOME       spark distribution (default /opt/spark)
#   GRAFT_JAR        packaged library (default: newest target/scala-2.13/*.jar)
#   SPARK_MASTER     cluster master (default local[*]); on k8s:
#                    k8s://https://<apiserver>  plus the usual
#                    spark.kubernetes.* confs appended via SUBMIT_ARGS
#   SUBMIT_ARGS      extra spark-submit arguments (executor sizing, confs)
set -euo pipefail

SPARK_HOME="${SPARK_HOME:-/opt/spark}"
GRAFT_JAR="${GRAFT_JAR:-$(ls -t "$(dirname "$0")"/../target/scala-2.13/*.jar 2>/dev/null | head -1)}"
[ -n "$GRAFT_JAR" ] || { echo "no jar found — run 'sbt package' first" >&2; exit 1; }

cmd="${1:?usage: spark-submit.sh run|curate|test-config|dry-run|generate|pseudo <args...>}"
shift
case "$cmd" in
  run)         class=graft.Run ;;
  curate)      class=graft.Curate ;;
  test-config) class=graft.TestConfig ;;
  dry-run)     class=graft.DryRun ;;
  generate)    class=graft.streaming.Generator ;;
  pseudo)      class=graft.PseudoTools ;;
  *) echo "unknown command: $cmd" >&2; exit 1 ;;
esac

exec "$SPARK_HOME/bin/spark-submit" \
  --master "${SPARK_MASTER:-local[*]}" \
  --class "$class" \
  ${SUBMIT_ARGS:-} \
  "$GRAFT_JAR" "$@"
