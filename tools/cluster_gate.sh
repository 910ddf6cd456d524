#!/usr/bin/env bash
# Multi-JVM correctness gate: run the FULL verify board under
# local-cluster[2,16,4096] — two real executor processes, so every
# custom Catalyst expression/aggregate (MinHashAgg, SimHashAgg,
# SpaceSavingAgg, PqEncode codebooks, Bloom/Vector expressions,
# CanonicalizeJson, RollingHash), every broadcast, and every RocksDB
# state-store interaction crosses an executor serialization boundary
# exactly as on a production cluster. local[32] never exercises that;
# this gate converts "designed for a cluster" into evidence.
#
#   tools/cluster_gate.sh [sfDir] [outDir]
#
# Defaults: sfDir=/root/testdata/sf0.001, outDir=/tmp/graft_verify_lc.
# Writes the per-query compare log next to outDir as
# <outDir>_compare.log; exits nonzero if any query fails.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="${2:-/tmp/graft_verify_lc}"
JAR="target/scala-2.13/kinesislogstreamerspark_2.13-0.1.0.jar"

sbt -batch package >/dev/null

# SPARK_SCALA_VERSION: the distribution layout at /opt/spark has no
# launcher/target build dirs, and WorkerCommandBuilder's executor
# launch probes them unless the version is pinned by env.
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="local-cluster[2,16,4096]" \
SPARK_GRAFT_JAR="$(pwd)/$JAR" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"

python3 tools/verify_local.py "$SF_DIR" "$OUT_DIR" \
  | tee "${OUT_DIR}_compare.log"

grep -q ", 0 fail" "${OUT_DIR}_compare.log"
