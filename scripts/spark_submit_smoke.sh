#!/usr/bin/env bash
# Deployment smoke: run a small end-to-end crawl through `spark-submit
# --py-files`, the north-rule deploy mode — NOT an in-process SparkSession.
#
# Packages ba_gepris_crawler_spark into a zip (the artifact you'd ship to a
# real cluster's executors), then submits the CLI module against it. On a
# multi-executor cluster only --master changes (e.g. yarn / k8s://...);
# the engine never reads local state outside the crawl --root, so the same
# zip works unmodified.
#
# Usage: scripts/spark_submit_smoke.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-$(mktemp -d /tmp/submit_smoke.XXXX)}"
ZIP="$WORK/ba_gepris_crawler_spark.zip"
SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

python scripts/make_pyfiles.py "$ZIP"

"$SPARK_SUBMIT" \
  --master "${SPARK_GRAFT_MASTER:-local[8]}" \
  --conf spark.sql.shuffle.partitions=16 \
  --py-files "$ZIP" \
  ba_gepris_crawler_spark/cli.py \
  new-crawl "$WORK/crawl" --projects 600 --hosts 4 --max-rounds 6

# the crawl must have committed rounds and reached done=True
python - "$WORK/crawl" <<'EOF'
import json, pathlib, sys
root = pathlib.Path(sys.argv[1])
manifests = sorted(root.glob("manifests/round-*.json"))
assert manifests, "no committed rounds"
last = json.loads(manifests[-1].read_text())
assert last["counters"].get("done"), f"crawl did not finish: {last['counters']}"
total = sum(json.loads(p.read_text())["counters"].get("fetched", 0) for p in manifests)
print(f"OK spark-submit crawl: {len(manifests)} rounds, {total} pages, done=True")
EOF
