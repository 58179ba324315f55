#!/usr/bin/env bash
# Two-cluster-size scaling evidence (BASELINE.json north_rule):
# package the engine once, then spark-submit graft.ScalingBench on the
# SAME input at --master local[8] and --master local[32] (N vs 4N
# executors stand-in; this host has 32 PHYSICAL cores, 1 thread/core
# per lscpu — so 8-vs-32 measures real core scaling), then compute
# efficiency = (T8 / T32) / 4 and write BENCH/BASELINE.md.
#
# Usage: tools/scaling_bench.sh [sfDir]   (default /root/testdata/sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
mkdir -p BENCH target/bench

sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | head -1)

# Heap scales with parallelism (3 GiB/core): a 4N-executor cluster has
# 4x the total memory of an N-executor one, so the single-JVM stand-in
# must scale the heap with the simulated executor count — a fixed heap
# would starve per-task execution memory 4x at local[32] and measure
# memory pressure, not scaling. -Xms=-Xmx + AlwaysPreTouch: executors
# start with a settled heap; a lazily-grown one makes the 4N run
# measure kernel page zeroing, not scaling.
run() {
  local cpus=$1
  local mem="$((cpus * 3))g"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$cpus" \
  SPARK_GRAFT_SCALE="${SPARK_GRAFT_SCALE:-6400}" \
    /opt/spark/bin/spark-submit \
      --master "local[$cpus]" \
      --class graft.ScalingBench \
      --driver-memory "$mem" \
      --conf spark.driver.extraJavaOptions="-Xms$mem -XX:+AlwaysPreTouch" \
      "$JAR" 2>>/tmp/scaling_stderr.log |
    grep -o '{"metric".*}' | tail -1
}

echo "running local[8]..." >&2
J8=$(run 8)
echo "$J8" > target/bench/bench8.json
echo "running local[32]..." >&2
J32=$(run 32)
echo "$J32" > target/bench/bench32.json

python3 - "$SF" <<'EOF'
import json, sys
j8 = json.load(open('target/bench/bench8.json'))
j32 = json.load(open('target/bench/bench32.json'))
sf = sys.argv[1]
t8, t32 = j8['value'], j32['value']
pages = j8.get('pages', 0)
# throughput scales as 1/T on fixed input; N=8 cores, 4N=32 cores
eff = (t8 / t32) / 4.0
# the headline metric per BASELINE.json: PIP-join pages/sec at both
# levels (the PIP input is sized so pip_join >= 30 s at local[32] —
# compute-bound, not overhead-bound)
p8, p32 = j8['queries']['pip_join'], j32['queries']['pip_join']
pps8, pps32 = pages / p8, pages / p32
pip_eff = pps32 / (4.0 * pps8)
lines = [
    '# BENCH/BASELINE.md — measured scaling evidence',
    '',
    f'Input: `{sf}` (same deterministic input at both parallelism levels),',
    'run via `spark-submit --class graft.ScalingBench` on the packaged jar',
    '(--master local[8] vs local[32] = N vs 4N executor stand-in per',
    'BASELINE.md; heap scales with parallelism (3 GiB/core) because a',
    '4N-executor cluster has 4x the total memory of an N-executor one;',
    'this host: 32 physical cores, 1 thread/core).',
    '',
    '| parallelism | wall (s) | pages | pages/sec (PIP join) | total q/s |',
    '|---|---|---|---|---|',
    f"| local[8]  | {t8:.2f} | {pages} | {j8.get('pip_pages_per_sec',0):.0f} | {len(j8['queries'])/t8:.3f} |",
    f"| local[32] | {t32:.2f} | {pages} | {j32.get('pip_pages_per_sec',0):.0f} | {len(j32['queries'])/t32:.3f} |",
    '',
    f'**Headline scaling efficiency (PIP-join pages/sec, the BASELINE.json metric)**',
    f'= pps32 / (4 x pps8) = {pps32:.0f} / (4 x {pps8:.0f}) = **{pip_eff:.3f}**',
    f'(target >= 0.8; pip_join runs {p32:.1f} s at local[32] / {p8:.1f} s at',
    'local[8] against the dense zone layer — compute-bound, so the ratio',
    'measures the ray-cast kernel scaling, not fixed job overhead)',
    '',
    f'**Whole-suite wall efficiency** = (T8/T32)/(32/8) = ({t8:.2f}/{t32:.2f})/4 = **{eff:.3f}**',
    f'(raw speedup {t8/t32:.2f}x on 4x cores)',
    '',
    '## Per-query seconds',
    '',
    '| query | local[8] | local[32] | speedup |',
    '|---|---|---|---|',
]
for q in sorted(j8['queries']):
    a, b = j8['queries'][q], j32['queries'].get(q, float('nan'))
    lines.append(f'| {q} | {a:.2f} | {b:.2f} | {a/b if b else 0:.2f}x |')
open('BENCH/BASELINE.md', 'w').write('\n'.join(lines) + '\n')
print('\n'.join(lines[:15]))
EOF
