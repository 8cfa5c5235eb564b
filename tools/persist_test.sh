#!/bin/bash
# e2e: tables, views, users and constraints survive a server restart
# under --db_path (reference analog: the single DuckDB file, main.go:18).
# Usage: bash tools/persist_test.sh [pg_port] [ch_port]
set -u
PG=${1:-5436}
CH=${2:-8127}
DB=$(mktemp -d /tmp/graft_persist.XXXXXX)
LOG=/tmp/graft_persist_server.log
P="-h 127.0.0.1 -p $PG -U persist -d main"
pass=0; fail=0
ok()  { pass=$((pass+1)); echo "PASS $1"; }
bad() { fail=$((fail+1)); echo "FAIL $1"; }
chk() { if [ "$2" = "$3" ]; then ok "$1"; else bad "$1 (expected [$2] got [$3])"; fi }

start_server() {
  rm -f "$LOG"
  nohup bash "$(dirname "$0")/run_server.sh" "$PG" "$CH" \
    /root/testdata/sf0.001 "--db_path=$DB" > "$LOG" 2>&1 &
  SRV_PID=$!
  for i in $(seq 1 90); do
    grep -q "graft server ready" "$LOG" 2>/dev/null && return 0
    sleep 2
  done
  echo "server failed to start"; tail -5 "$LOG"; exit 1
}
stop_server() { kill "$SRV_PID" 2>/dev/null; wait "$SRV_PID" 2>/dev/null; }

cd "$(dirname "$0")/.."
start_server
chk "create table"  "CREATE TABLE" "$(psql $P -c 'create table main.pt (k int primary key, v string) using parquet' 2>&1 | head -1)"
chk "insert"        "INSERT 0 2"  "$(psql $P -c "insert into main.pt values (1,'a'),(2,'b')" 2>&1 | head -1)"
chk "create view"   "CREATE"      "$(psql $P -c 'create view main.pv as select k+10 as k10 from main.pt' 2>&1 | head -1)"
chk "create user"   "CREATE ROLE" "$(psql $P -c "create user persist with password 'ppw'" 2>&1 | head -1)"
chk "create macro"  "CREATE MACRO" "$(psql $P -c 'create macro pmac(a, b := 100) as a + b' 2>&1 | head -1)"
stop_server

start_server
chk "table survives"  "2"   "$(psql $P -tA -c 'select count(*) from main.pt' 2>&1)"
chk "data survives"   "a"   "$(psql $P -tA -c 'select v from main.pt where k=1' 2>&1)"
chk "view survives"   "11"  "$(psql $P -tA -c 'select min(k10) from main.pv' 2>&1)"
chk "user survives"   "1"   "$(curl -s -u persist:ppw "http://127.0.0.1:$CH/?query=SELECT%201")"
chk "pk survives"     "dup" "$(psql $P -c "insert into main.pt values (1,'dup')" 2>&1 | grep -q 'unique' && echo dup)"
chk "macro survives"  "103"  "$(psql $P -tA -c 'select pmac(3)' 2>&1)"
chk "drop macro"      "DROP MACRO" "$(psql $P -c 'drop macro pmac' 2>&1 | head -1)"
chk "drop table"      "DROP"  "$(psql $P -c 'drop view main.pv' >/dev/null 2>&1; psql $P -c 'drop table main.pt' 2>&1 | head -1)"
stop_server

# dropped table stays dropped across restart
start_server
chk "drop survives"  "gone"  "$(psql $P -tA -c 'select count(*) from main.pt' >/dev/null 2>&1 && echo present || echo gone)"
chk "macro drop survives" "gone" "$(psql $P -tA -c 'select pmac(3)' >/dev/null 2>&1 && echo present || echo gone)"
stop_server

rm -rf "$DB"
echo "persist: $pass passed, $fail failed"
exit $((fail > 0))
