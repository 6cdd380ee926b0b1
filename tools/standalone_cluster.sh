#!/bin/bash
# Launch (or tear down) a local Spark standalone cluster for the
# N-vs-4N-executor scaling sweep: 1 master + 4 workers (2 cores / 10g
# each) on 127.0.0.1.  Usage:
#   tools/standalone_cluster.sh start
#   tools/standalone_cluster.sh stop
#
# Sweep legs (same input, executor count is the only variable):
#   SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 SPARK_GRAFT_CPUS=2 \
#       python bench.py --job overlay_scale --n 800000   # 1 executor
#   SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 SPARK_GRAFT_CPUS=8 \
#       python bench.py --job overlay_scale --n 800000   # 4 executors
set -e
SPARK_DIR=$(python -c 'import pyspark, os; print(os.path.dirname(pyspark.__file__))')
case "${1:-start}" in
  start)
    export SPARK_NO_DAEMONIZE=1
    nohup "$SPARK_DIR/bin/spark-class" org.apache.spark.deploy.master.Master \
        -h 127.0.0.1 -p 7077 --webui-port 8080 > /tmp/spark-master.log 2>&1 &
    sleep 5
    for i in 1 2 3 4; do
      nohup "$SPARK_DIR/bin/spark-class" org.apache.spark.deploy.worker.Worker \
          spark://127.0.0.1:7077 -c 2 -m 10g --webui-port "808$i" \
          > "/tmp/spark-worker$i.log" 2>&1 &
    done
    sleep 8
    grep -c "Registering worker" /tmp/spark-master.log
    ;;
  stop)
    pkill -f org.apache.spark.deploy.worker.Worker || true
    pkill -f org.apache.spark.deploy.master.Master || true
    ;;
esac
