#!/usr/bin/env bash
# Shell test for tools/keep_best.sh (r16 verdict item 1: "a
# spec-or-shell test of the guard"; class-rank cases added in r18 per
# the r17 verdict item 2). Run: bash tools/test_keep_best.sh
set -u
cd "$(dirname "$0")"
. ./keep_best.sh
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
FAILS=0
chk() { # $1 desc, $2 cond (already evaluated: 0 ok)
  if [ "$2" = 0 ]; then echo "ok   - $1"; else echo "FAIL - $1"; FAILS=$((FAILS+1)); fi
}
clean='{"metric":"total","value":100.0,"anchor":{"start":1.0,"end":1.1,"expected":[0.55,2.2],"ratio":0.909,"class":"ok"},"contended":false}'
contended='{"metric":"total","value":300.0,"anchor":{"start":1.0,"end":5.0,"expected":[0.55,2.2],"ratio":0.909,"class":"ok"},"contended":true}'
anchorslow='{"metric":"total","value":280.0,"anchor":{"start":3.9,"end":4.1,"expected":[0.55,2.2],"ratio":3.545,"class":"slow"},"contended":false}'
clean2='{"metric":"total","value":95.0,"anchor":{"start":0.9,"end":1.0,"expected":[0.55,2.2],"ratio":0.818,"class":"ok"},"contended":false}'
degraded='{"metric":"total","value":180.0,"anchor":{"start":1.94,"end":2.23,"expected":[0.55,2.2],"ratio":1.764,"class":"degraded"},"contended":false}'
degraded2='{"metric":"total","value":175.0,"anchor":{"start":1.9,"end":2.0,"expected":[0.55,2.2],"ratio":1.727,"class":"degraded"},"contended":false}'
unknown='{"metric":"total","value":120.0,"anchor":{"start":-1,"end":-1,"expected":[0.55,2.2],"ratio":-1,"class":"unknown"},"contended":false}'

# 1. contended draw must NOT replace a clean record
f="$TMP/a.json"; echo "$clean" > "$f"; save_prev "$f"; echo "$contended" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 1 ] && grep -q '"value":100.0' "$f" && grep -q '"value":300.0' "$TMP/a.rejected.json"
chk "contended draw rejected, clean restored, draw parked at .rejected" $?

# 2. anchor-slow (stable but slow host) draw must NOT replace a clean record
f="$TMP/b.json"; echo "$clean" > "$f"; save_prev "$f"; echo "$anchorslow" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 1 ] && grep -q '"value":100.0' "$f" && grep -q '"value":280.0' "$TMP/b.rejected.json"
chk "anchor-slow draw rejected even with contended:false" $?

# 3. clean draw replaces clean record (normal path)
f="$TMP/c.json"; echo "$clean" > "$f"; save_prev "$f"; echo "$clean2" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 0 ] && grep -q '"value":95.0' "$f" && [ ! -f "$f.prev" ]
chk "clean draw kept, prev cleaned up" $?

# 4. clean draw replaces a POLLUTED standing record (recovery path —
#    exactly what the r17 clean re-draw must be allowed to do)
f="$TMP/d.json"; echo "$contended" > "$f"; save_prev "$f"; echo "$clean" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 0 ] && grep -q '"value":100.0' "$f"
chk "clean draw replaces polluted standing record" $?

# 5. contended draw with NO standing record is kept (first record —
#    a stamped-polluted number beats no number; the stamp tells)
f="$TMP/e.json"; save_prev "$f"; echo "$contended" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 0 ] && grep -q '"value":300.0' "$f"
chk "polluted first record kept (no clean record to protect)" $?

# 6. bench produced no file: prev is cleaned, no crash
f="$TMP/g.json"; echo "$clean" > "$f"; save_prev "$f"; rm -f "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 0 ] && [ ! -f "$f.prev" ]
chk "missing artifact handled" $?

# 7. DEGRADED draw must not replace an ok record (r17 verdict item 2:
#    the 1.94/2.23 host class)
f="$TMP/h.json"; echo "$clean" > "$f"; save_prev "$f"; echo "$degraded" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 1 ] && grep -q '"value":100.0' "$f" && grep -q '"value":180.0' "$TMP/h.rejected.json"
chk "degraded draw rejected against ok record" $?

# 8. ok draw replaces a degraded standing record (the fast-class
#    re-draw path this round exists for)
f="$TMP/i.json"; echo "$degraded" > "$f"; save_prev "$f"; echo "$clean" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 0 ] && grep -q '"value":100.0' "$f"
chk "ok draw replaces degraded standing record" $?

# 9. degraded draw may replace a degraded record (same badness —
#    fresher evidence wins within a class)
f="$TMP/j.json"; echo "$degraded" > "$f"; save_prev "$f"; echo "$degraded2" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 0 ] && grep -q '"value":175.0' "$f"
chk "degraded draw replaces degraded record" $?

# 10. anchor-UNKNOWN draw must not replace a verified-ok record
#     (r17 ADVICE: unverifiable environment is not clean)
f="$TMP/k.json"; echo "$clean" > "$f"; save_prev "$f"; echo "$unknown" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 1 ] && grep -q '"value":100.0' "$f" && grep -q '"value":120.0' "$TMP/k.rejected.json"
chk "anchor-unknown draw rejected against ok record" $?

# 11. unknown may still replace slow/contended (it is LESS bad than a
#     known-polluted record)
f="$TMP/l.json"; echo "$anchorslow" > "$f"; save_prev "$f"; echo "$unknown" > "$f"
keep_best "$f" >/dev/null; rc=$?
[ $rc = 0 ] && grep -q '"value":120.0' "$f"
chk "unknown draw replaces anchor-slow record" $?

# 12-14. merge_bench contract (r18 review findings): the merged class
#        must be a class some family actually had (all-fast merges to
#        fast, not ok — make_baseline refuses fast too), and a partial
#        merge must self-describe so round_chain can park it instead of
#        offering a silently-truncated record to keep_best
fastfam='{"metric":"total","value":50.0,"queries":{"q1":50.0},"failed":[],"anchor":{"ratio":0.45,"class":"fast"},"contended":false,"sf":"x"}'
fastfam2='{"metric":"total","value":60.0,"queries":{"q2":60.0},"failed":[],"anchor":{"ratio":0.40,"class":"fast"},"contended":false,"sf":"x"}'
okfam='{"metric":"total","value":70.0,"queries":{"q3":70.0},"failed":[],"anchor":{"ratio":1.0,"class":"ok"},"contended":false,"sf":"x"}'
echo "$fastfam" > "$TMP/BENCH_f1.json"; echo "$fastfam2" > "$TMP/BENCH_f2.json"
python3 ./merge_bench.py "$TMP/m1.json" "$TMP/BENCH_f1.json" "$TMP/BENCH_f2.json" >/dev/null
grep -q '"class":"fast"' "$TMP/m1.json"
chk "all-fast families merge to class fast, not ok" $?

echo "$okfam" > "$TMP/BENCH_f3.json"
python3 ./merge_bench.py "$TMP/m2.json" "$TMP/BENCH_f1.json" "$TMP/BENCH_f3.json" >/dev/null
grep -q '"class":"fast"' "$TMP/m2.json"
chk "mixed fast+ok merges to the fast hazard, not ok" $?

python3 ./merge_bench.py --partial "$TMP/m3.json" "$TMP/BENCH_f1.json" >/dev/null
grep -q '"partial":true' "$TMP/m3.json" && ! grep -q '"partial"' "$TMP/m1.json"
chk "--partial stamps partial:true (absent on full merges)" $?

echo
if [ "$FAILS" = 0 ]; then echo "keep_best: ALL PASS"; else echo "keep_best: $FAILS FAILED"; exit 1; fi
