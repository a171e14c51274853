#!/usr/bin/env bash
# Live Kafka lane, one command (VERDICT r04 #5): start the single
# broker the reference develops against (reference: compose.yml:3-26),
# put the spark-sql-kafka connector on the classpath, run the
# end-to-end wire tests, tear down. The same pytest suite self-gates
# via kafka_available(spark), so in an environment without docker or
# network this script reports the exact blocker and exits non-zero
# instead of silently skipping.
#
#   tools/run_kafka_lane.sh            # full lane: up -> test -> down
#   KEEP_BROKER=1 tools/run_kafka_lane.sh   # leave the broker running
set -euo pipefail
cd "$(dirname "$0")/.."

SCALA_VER="${SCALA_VER:-2.13}"
SPARK_VER="$(python3 -c 'import pyspark; print(pyspark.__version__)')"
PKG="org.apache.spark:spark-sql-kafka-0-10_${SCALA_VER}:${SPARK_VER}"

if ! docker info >/dev/null 2>&1; then
    echo "BLOCKED: no reachable docker daemon — cannot start the broker" >&2
    echo "         (docker/kafka-compose.yml needs 'docker compose up')" >&2
    exit 2
fi

docker compose -f docker/kafka-compose.yml up -d

echo "waiting for broker on localhost:9092 ..."
for _ in $(seq 1 60); do
    if python3 - <<'EOF' >/dev/null 2>&1
import socket
socket.create_connection(("localhost", 9092), 1).close()
EOF
    then
        break
    fi
    sleep 2
done

# --packages resolves the connector from Maven Central into ~/.ivy2;
# needs network the first time, cached afterwards.
export PYSPARK_SUBMIT_ARGS="--packages ${PKG} pyspark-shell"
status=0
python -m pytest tests/test_kafka_integration.py -m live_kafka -q -rs || status=$?

if [ "${KEEP_BROKER:-0}" != "1" ]; then
    docker compose -f docker/kafka-compose.yml down -v
fi
exit "$status"
