#!/bin/bash
# Seeded kill-schedule probe for the CYCLE-HOP PUBLISH phase (r14,
# VERDICT r13 item 6): an a<->b swap cycle commits via a journaled
# temp-name hop; kill -9 lands at a SEEDED random delay straddling the
# COMMIT, so across seeds the kill samples before / inside / after the
# publish window. After restart the invariant is atomicity:
#   EITHER the pre-swap state is intact (kill before the journal wrote)
#   OR the swap is fully applied (journal rolled the commit forward)
#   — never a mixed pair, never a stranded hop (__txn* dir or catalog
#   name), and the PK registration follows whichever outcome landed.
# Usage: bash tools/cycle_kill_test.sh [pg_port] [ch_port] [n_seeds]
set -u
PG=${1:-5439}
CH=${2:-8130}
NSEEDS=${3:-6}
LOG=/tmp/graft_cyckill_server.log
P="-h 127.0.0.1 -p $PG -U cyc -d main"
pass=0; fail=0
ok()  { pass=$((pass+1)); echo "PASS $1"; }
bad() { fail=$((fail+1)); echo "FAIL $1"; }

cd "$(dirname "$0")/.."

start_server() { # $1 = db dir
  rm -f "$LOG"
  nohup bash tools/run_server.sh "$PG" "$CH" \
    /root/testdata/sf0.001 "--db_path=$1" > "$LOG" 2>&1 &
  SRV_PID=$!
  for i in $(seq 1 90); do
    grep -q "graft server ready" "$LOG" 2>/dev/null && return 0
    sleep 2
  done
  echo "server failed to start"; tail -5 "$LOG"; exit 1
}
stop_server() {
  kill -9 "$SRV_PID" 2>/dev/null; wait "$SRV_PID" 2>/dev/null
  pkill -9 -f "graft.server.ServerMain $PG" 2>/dev/null
  sleep 1
}

for seed in $(seq 1 "$NSEEDS"); do
  DB=$(mktemp -d /tmp/graft_cyckill.XXXXXX)
  start_server "$DB"
  psql $P -q -c 'create table main.swa (k int primary key, v varchar)' \
          -c "insert into main.swa values (1,'a')" \
          -c 'create table main.swb (k int primary key, v varchar)' \
          -c "insert into main.swb values (2,'b')" >/dev/null 2>&1

  # swap txn on a background psql; BEGIN+renames settle first, then the
  # COMMIT fires and the kill lands a seeded 0-400 ms later
  FIFO=$(mktemp -u /tmp/graft_cyckill_fifo.XXXXXX)
  mkfifo "$FIFO"
  psql $P -f /dev/stdin < "$FIFO" > /tmp/graft_cyckill_psql.log 2>&1 &
  PSQL_PID=$!
  exec 9>"$FIFO"
  cat >&9 <<'SQL'
BEGIN;
ALTER TABLE main.swb RENAME TO main.swc;
ALTER TABLE main.swa RENAME TO main.swb;
ALTER TABLE main.swc RENAME TO main.swa;
SQL
  sleep 4
  echo "COMMIT;" >&9
  # seeded kill delay: seed k -> (k*67 mod 400) ms after COMMIT went in
  DELAY_MS=$(( (seed * 67) % 400 ))
  python3 - "$DELAY_MS" <<'EOF'
import sys, time
time.sleep(int(sys.argv[1]) / 1000.0)
EOF
  stop_server
  exec 9>&- 2>/dev/null
  kill "$PSQL_PID" 2>/dev/null; wait "$PSQL_PID" 2>/dev/null
  rm -f "$FIFO"

  start_server "$DB"
  A=$(psql $P -tA -F'|' -c 'select k, v from main.swa' 2>&1)
  B=$(psql $P -tA -F'|' -c 'select k, v from main.swb' 2>&1)
  if { [ "$A" = "1|a" ] && [ "$B" = "2|b" ]; }; then
    ok "seed $seed (+${DELAY_MS}ms): pre-swap state intact (kill beat the journal)"
  elif { [ "$A" = "2|b" ] && [ "$B" = "1|a" ]; }; then
    ok "seed $seed (+${DELAY_MS}ms): swap rolled forward"
  else
    bad "seed $seed (+${DELAY_MS}ms): MIXED state a=[$A] b=[$B]"
  fi
  strays=$(ls -d "$DB"/warehouse/main.db/*__txn* "$DB"/warehouse/main.db/*__rescued* 2>/dev/null | wc -l)
  [ "$strays" = "0" ] && ok "seed $seed: no stranded hop dirs" \
                      || bad "seed $seed: $strays stranded staging dirs"
  catstrays=$(psql $P -tA -c "select table_name from information_schema.tables where table_name like '%\\_\\_txn%' escape '\\' or table_name like '%\\_\\_rescued%' escape '\\'" 2>&1)
  [ -z "$catstrays" ] && ok "seed $seed: catalog clean" \
                      || bad "seed $seed: catalog strays [$catstrays]"
  # PK registration follows whichever table owns each name now
  dup=$(psql $P -c "insert into main.swa select k, 'dup' from main.swa limit 1" 2>&1 | grep -ci "unique\|duplicate")
  [ "$dup" -ge 1 ] && ok "seed $seed: PK enforced post-recovery" \
                   || bad "seed $seed: PK lost after recovery"
  stop_server
  rm -rf "$DB"
done

echo "cycle-kill: $pass passed, $fail failed over $NSEEDS seeds"
exit $((fail > 0))
