#!/usr/bin/env bash
# Bench two commits back-to-back under identical host conditions and report
# per-query ratios — the mechanical form of the round-6 manual replay that
# separated host drift (~1.4x slower machine) from code regression.
#
# Usage: tools/bench_replay.sh [--stream] [BASE_REF] [SF_DIR]
#   --stream  streaming-throughput-only replay: skips every registered query
#             (SPARK_GRAFT_BENCH_FILTER set to a prefix nothing matches) and
#             compares only the best-of-3 steady-state stream figure + its
#             spread. Works against any base commit since r7 (BENCH_FILTER
#             is honored from 46ed3ed onward).
#   BASE_REF  commit to compare against (default HEAD~1)
#   SF_DIR    testdata scale dir (default /root/testdata/sf0.01 — small on
#             purpose: a replay wants many cheap queries, not one slow run)
#
# Output: per-query base/head seconds + ratio, geometric-mean ratio, stream
# rows/sec (+ runs/spread where the commit records them), and a verdict
# line. Writes base/head bench_full.json to /tmp/bench_replay/.
set -euo pipefail
cd "$(dirname "$0")/.."

STREAM_ONLY=0
if [[ "${1:-}" == "--stream" ]]; then STREAM_ONLY=1; shift; fi

BASE_REF=${1:-HEAD~1}
SF_DIR=${2:-/root/testdata/sf0.01}
OUT=/tmp/bench_replay
WT=/tmp/bench_replay_worktree
mkdir -p "$OUT"

FILTER_ENV=()
if [[ "$STREAM_ONLY" == 1 ]]; then
  # a prefix no registered query starts with -> zero timed queries, the
  # stream measurement (which BENCH_FILTER does not gate) still runs
  FILTER_ENV=(SPARK_GRAFT_BENCH_FILTER="__stream_only__")
fi

BASE_SHA=$(git rev-parse --short "$BASE_REF")
HEAD_SHA=$(git rev-parse --short HEAD)
echo "replaying base=$BASE_SHA vs head=$HEAD_SHA on $SF_DIR (stream_only=$STREAM_ONLY)"

git worktree remove --force "$WT" 2>/dev/null || true
git worktree add --detach "$WT" "$BASE_REF" >/dev/null

# base first, head second: if background load decays over the run it biases
# AGAINST head, so a head win is conservative
(cd "$WT" && env "${FILTER_ENV[@]}" SPARK_GRAFT_SF_DIR="$SF_DIR" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-4}" \
  SPARK_GRAFT_BENCH_OUT="$OUT/base.json" \
  sbt -batch "runMain graft.Bench" >"$OUT/base.log" 2>&1) || {
    echo "base bench failed — tail of log:"; tail -5 "$OUT/base.log"; exit 1; }
env "${FILTER_ENV[@]}" SPARK_GRAFT_SF_DIR="$SF_DIR" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-4}" \
  SPARK_GRAFT_BENCH_OUT="$OUT/head.json" \
  sbt -batch "runMain graft.Bench" >"$OUT/head.log" 2>&1 || {
    echo "head bench failed — tail of log:"; tail -5 "$OUT/head.log"; exit 1; }

git worktree remove --force "$WT" >/dev/null

python3 - "$OUT/base.json" "$OUT/head.json" "$BASE_SHA" "$HEAD_SHA" <<'PY'
import json, math, os, re, sys

def load(path):
    # old-format commits ignore SPARK_GRAFT_BENCH_OUT and print one long
    # JSON line instead — fall back to the last JSON object in the log
    if os.path.exists(path):
        return json.load(open(path))
    log = path.replace(".json", ".log")
    line = [l for l in open(log, errors="replace")
            if re.search(r'\{.*"queries".*\}', l)][-1]
    return json.loads(line[line.index("{"):])

base, head = load(sys.argv[1]), load(sys.argv[2])
bq, hq = base["queries"], head["queries"]
common = sorted(k for k in bq if k in hq and bq[k] > 0 and hq[k] > 0)
ratios = {k: hq[k] / bq[k] for k in common}

if ratios:
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:10]
    print(f"\n{'query':36s} {'base':>8s} {'head':>8s} {'ratio':>6s}")
    for k, r in worst:
        print(f"{k:36s} {bq[k]:8.3f} {hq[k]:8.3f} {r:6.2f}")
    gm = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    only_b = set(bq) - set(hq); only_h = set(hq) - set(bq)
    print(f"\nn_common={len(common)}  base_total={base['value']:.1f}s  "
          f"head_total={head['value']:.1f}s  geomean_ratio={gm:.3f}")
    if only_b: print(f"only in base: {sorted(only_b)}")
    if only_h: print(f"only in head: {sorted(only_h)}")

def show_stream(tag, a):
    s = a.get("stream", {})
    if s.get("rows_per_sec", -1) <= 0:
        print(f"stream {tag}: unavailable"); return None
    extra = ""
    if s.get("runs"):
        extra = f"  runs={s['runs']}  spread={s.get('spread')}"
    print(f"stream {tag}: {s['rows_per_sec']:.0f} rows/sec{extra}")
    return s["rows_per_sec"]

print()
b_rps = show_stream(f"base({sys.argv[3]})", base)
h_rps = show_stream(f"head({sys.argv[4]})", head)
if b_rps and h_rps:
    print(f"stream ratio head/base: {h_rps / b_rps:.2f}x "
          "(note: pre-protocol commits report a single unwarmed run "
          "including bootstrap — expect base to read low)")

gm = (math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
      if ratios else None)

# THE GATE (round-9 advice: a human had to read the ratios): any query
# whose BASE time clears the noise floor and regresses past the ratio gate
# fails the replay. Sub-floor queries swing 2-3x on host noise alone —
# they never gate, only the geomean speaks for them.
NOISE_FLOOR_S = float(os.environ.get("REPLAY_NOISE_FLOOR_S", "0.5"))
RATIO_GATE = float(os.environ.get("REPLAY_RATIO_GATE", "1.5"))
regressions = sorted((k for k, r in ratios.items()
                      if bq[k] >= NOISE_FLOOR_S and r > RATIO_GATE),
                     key=lambda k: -ratios[k])

artifact = os.environ.get("BENCH_REPLAY_ARTIFACT", "/tmp/bench_replay/replay.json")
summary = {"base": sys.argv[3], "head": sys.argv[4], "n_common": len(common),
           "geomean_ratio": gm, "noise_floor_s": NOISE_FLOOR_S,
           "ratio_gate": RATIO_GATE, "regressions": regressions,
           "base_s": bq, "head_s": hq,
           "stream_rps": {"base": b_rps, "head": h_rps}}
with open(artifact, "w") as f:
    json.dump(summary, f, indent=1)
print(f"replay artifact: {artifact}")

if ratios:
    verdict = ("HEAD FASTER" if gm < 0.95 else
               "HEAD SLOWER" if gm > 1.05 else "NO MATERIAL CHANGE")
    print(f"verdict ({sys.argv[3]} -> {sys.argv[4]}): {verdict} (geomean {gm:.3f})")
else:
    print(f"verdict ({sys.argv[3]} -> {sys.argv[4]}): stream-only replay, "
          "no query geomean")

if regressions:
    print(f"\nREGRESSION GATE FAILED: {len(regressions)} quer"
          f"{'y' if len(regressions) == 1 else 'ies'} above {NOISE_FLOOR_S}s "
          f"base regressed past {RATIO_GATE}x:")
    for k in regressions:
        print(f"  {k}: {bq[k]:.3f}s -> {hq[k]:.3f}s ({ratios[k]:.2f}x)")
    sys.exit(2)
PY
