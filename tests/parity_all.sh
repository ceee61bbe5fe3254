#!/usr/bin/env bash
# End-of-round parity gate: the full query suite against the driver's
# sf0.01 roll PLUS four independently-seeded synthetic rolls (one with
# TIMESTAMP(NANOS) events) — every determinism bug found in rounds 1-3
# was invisible on a single roll.
#
#   bash tests/parity_all.sh          # ~70 min total
set -u
cd "$(dirname "$0")/.."
python tests/gen_testdata.py /tmp/alt_testdata   20260813
python tests/gen_testdata.py /tmp/alt_testdata2  777
python tests/gen_testdata.py /tmp/alt_testdata3  4242
python tests/gen_testdata.py /tmp/alt_testdata_ns 31337 --ns-events --ns-dates
python tests/gen_testdata.py /tmp/alt_testdata_nulls 90210 --nulls --flat-emb
python tests/gen_testdata.py /tmp/alt_testdata_nullns 13579 --nulls --ns-dates
python tests/gen_testdata.py /tmp/alt_testdata_ties 24680 --ties --flat-emb
fail=0
for d in /root/testdata/sf0.01 /tmp/alt_testdata /tmp/alt_testdata2 \
         /tmp/alt_testdata3 /tmp/alt_testdata_ns /tmp/alt_testdata_nulls \
         /tmp/alt_testdata_nullns /tmp/alt_testdata_ties; do
  out=/tmp/parity_$(basename "$d").txt
  python tests/parity.py "$d" > "$out" 2>&1
  rc=$?
  echo "$d: $(tail -1 "$out")"
  [ $rc -ne 0 ] && { fail=1; grep -A3 "^FAIL" "$out" | head -30; }
done
# the nulls roll ONCE MORE at local[32]: duplicate-id + high-parallelism
# interactions are invisible at local[8] (r4 caught llm_winnowing's
# window-tie nondeterminism only here)
out=/tmp/parity_nulls_cpu32.txt
SPARK_GRAFT_CPUS=32 python tests/parity.py /tmp/alt_testdata_nulls > "$out" 2>&1
rc=$?
echo "nulls@local[32]: $(tail -1 "$out")"
[ $rc -ne 0 ] && { fail=1; grep -A3 "^FAIL" "$out" | head -30; }
# committed evidence for queries outside the 50-query driver window
# (VERDICT r6 #5): PARITY_ALL.json summarizes this run; copy/rename to
# PARITY_ALL_r{N}.json and git add it at round end
python tests/parity_artifact.py PARITY_ALL.json > /dev/null || fail=1
exit $fail
