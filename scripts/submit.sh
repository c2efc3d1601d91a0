#!/usr/bin/env bash
# Cluster submission (north rule: "runs via spark-submit --py-files on
# multi-executor clusters at N and 4N executors").
#
# Packages the engine as a zip and submits the flagship pipeline (or
# any entry script given as $1).  In the sandbox this degrades to
# local[*]; on a real cluster pass --master/--num-executors through
# SPARK_SUBMIT_ARGS, e.g.
#   SPARK_SUBMIT_ARGS="--master yarn --num-executors 250 \
#     --executor-cores 4 --executor-memory 16g" scripts/submit.sh
# and run again with 4x executors for the two-cluster-size scaling
# measurement.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ENTRY="${1:-$REPO/scripts/run_pipeline.py}"

ZIP="$(mktemp -d)/geographiclib_go_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" geographiclib_go_spark -x '*__pycache__*')

exec spark-submit \
  --py-files "$ZIP" \
  ${SPARK_SUBMIT_ARGS:---master "local[${SPARK_GRAFT_CPUS:-32}]"} \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=65536 \
  "$ENTRY"
