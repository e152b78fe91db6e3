# Keep-best bench-record guard (r16 verdict item 1; class-ranked in
# r18 per the r17 verdict item 2). Sourced by round_chain.sh and by
# tools/test_keep_best.sh.
#
# The chain used to commit whatever draw the run produced; in r16 a
# drifted host overwrote the clean r15 sf10/sf1 records with
# contended:true draws (canary 5.53x) and the standing record a future
# round compares against became the polluted one. r17 then showed the
# binary clean/polluted split is too coarse: a 1.94/2.23 anchor draw
# (PLANS.md adjudicated ~1.8x slow) stamped class "ok" under the bare
# 2x ceiling and replaced a record drawn on a healthier host.
#
# Policy (r18): every artifact gets a BADNESS rank —
#     0  contended:false and anchor class ok/fast
#     1  contended:false and anchor class degraded
#     2  anchor class unknown (probe failed — environment unverifiable;
#        documented decision: an unverifiable draw must NOT replace a
#        verified record, but may replace another unverifiable one)
#     3  anchor class slow (cross-run slow-host stamp)
#     4  contended:true (within-sweep drift — worst: per-query numbers
#        are not even internally comparable)
# A new draw is kept iff its badness <= the standing record's. A
# rejected draw is parked at <name>.rejected.json with the reason in
# the note, so it stays inspectable; the standing record is restored.
# (Pre-r18 parked files used the *.contended.json name.)
#
# Usage:
#   save_prev BENCH_sf1.json          # before the bench run
#   ...run bench...
#   keep_best BENCH_sf1.json          # after; restores on rejection
#
# keep_best returns 0 if the new draw was kept, 1 if it was rejected
# (the caller's `note` function, if defined, gets a line either way).

_kb_note() { if type note >/dev/null 2>&1; then note "$@"; else echo "$@"; fi; }

_kb_class() {  # $1 = artifact -> anchor class string (unknown if absent)
  local c
  c=$(grep -Eo '"anchor":\{[^}]*"class":"[a-z]+"' "$1" 2>/dev/null \
      | grep -Eo '"class":"[a-z]+"' | head -1 | cut -d'"' -f4)
  echo "${c:-unknown}"
}

_kb_badness() {  # $1 = artifact -> 0..4 (see policy table above)
  if grep -q '"contended":true' "$1" 2>/dev/null; then echo 4; return; fi
  case "$(_kb_class "$1")" in
    ok|fast)  echo 0 ;;
    degraded) echo 1 ;;
    slow)     echo 3 ;;
    *)        echo 2 ;;   # unknown / unparseable
  esac
}

save_prev() {
  rm -f "$1.prev"
  [ -f "$1" ] && cp "$1" "$1.prev"
  return 0
}

keep_best() {
  local f="$1" prev="$1.prev"
  if [ ! -f "$f" ]; then rm -f "$prev"; return 0; fi
  if [ ! -f "$prev" ]; then return 0; fi          # no standing record
  local new_bad old_bad
  new_bad=$(_kb_badness "$f")
  old_bad=$(_kb_badness "$prev")
  if [ "$new_bad" -gt "$old_bad" ]; then
    mv "$f" "${f%.json}.rejected.json"
    mv "$prev" "$f"
    _kb_note "keep-best: REJECTED draw for $f (new class $(_kb_class "${f%.json}.rejected.json") badness $new_bad vs standing $(_kb_class "$f") badness $old_bad; parked at ${f%.json}.rejected.json; standing record restored)"
    return 1
  fi
  rm -f "$prev"
  return 0
}
