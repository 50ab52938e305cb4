#!/usr/bin/env bash
# Full test gate, sharded across N parallel pytest processes (default 4).
#
# The image has no pytest-xdist, so sharding is process-level: each
# worker gets SPARK_GRAFT_TEST_SHARD=i/N (deterministic md5(nodeid)
# assignment in tests/conftest.py — the union over shards is exactly
# the full suite) and its own JVM/SparkSession sized to its share of
# the cores, so N workers don't oversubscribe the box.
#
# Usage: scripts/run_suite_sharded.sh [N] [extra pytest args...]
set -u
N="${1:-4}"
shift || true
cd "$(dirname "$0")/.."
total_cpus="${SPARK_GRAFT_CPUS:-32}"
per=$(( total_cpus / N ))
[ "$per" -lt 2 ] && per=2
mkdir -p /tmp/suite_shards
pids=()
for i in $(seq 0 $((N - 1))); do
  SPARK_GRAFT_TEST_SHARD="$i/$N" SPARK_GRAFT_CPUS="$per" \
  SPARK_SHUFFLE_PARTITIONS="$per" \
    python -m pytest tests/ -q -p no:cacheprovider "$@" \
    > "/tmp/suite_shards/shard_$i.log" 2>&1 &
  pids+=($!)
done
rc=0
for i in $(seq 0 $((N - 1))); do
  wait "${pids[$i]}" || rc=1
  tail -1 "/tmp/suite_shards/shard_$i.log" | sed "s/^/shard $i: /"
done
exit $rc
