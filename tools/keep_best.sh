# Keep-best bench-record guard (r16 verdict item 1). Sourced by
# round_chain.sh and by tools/test_keep_best.sh.
#
# The chain used to commit whatever draw the run produced; in r16 a
# drifted host overwrote the clean r15 sf10/sf1 records with
# contended:true draws (canary 5.53x) and the standing record a future
# round compares against became the polluted one. Policy: a committed
# CLEAN record (contended:false AND anchor class not "slow") is never
# replaced by a POLLUTED draw (contended:true OR anchor class "slow",
# the cross-run slow-host stamp the endpoint canary cannot see). The
# rejected draw is parked at <name>.contended.json so it stays
# inspectable, and the clean record is restored.
#
# Usage:
#   save_prev BENCH_sf1.json          # before the bench run
#   ...run bench...
#   keep_best BENCH_sf1.json          # after; restores on pollution
#
# keep_best returns 0 if the new draw was kept, 1 if it was rejected
# (the caller's `note` function, if defined, gets a line either way).

_kb_note() { if type note >/dev/null 2>&1; then note "$@"; else echo "$@"; fi; }

_kb_polluted() {  # $1 = artifact: contended draw or anchor-slow host
  grep -q '"contended":true' "$1" && return 0
  grep -Eq '"anchor":\{[^}]*"class":"slow"' "$1" && return 0
  return 1
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
  local new_bad=0 old_clean=1
  _kb_polluted "$f" && new_bad=1
  _kb_polluted "$prev" && old_clean=0
  if [ "$new_bad" = 1 ] && [ "$old_clean" = 1 ]; then
    mv "$f" "${f%.json}.contended.json"
    mv "$prev" "$f"
    _kb_note "keep-best: REJECTED polluted draw for $f (parked at ${f%.json}.contended.json; clean committed record restored)"
    return 1
  fi
  rm -f "$prev"
  return 0
}
