#!/bin/bash
# End-to-end server battery: drives the live graft server through psql +
# curl + the raw-socket extended-protocol probe. Start the server first:
#   sbt 'runMain graft.server.ServerMain 5433 8124 /root/testdata/sf0.001'
# Usage: bash tools/server_smoke.sh [pg_port] [ch_port]
set -u
PG=${1:-5433}
CH=${2:-8124}
P="-h 127.0.0.1 -p $PG -U smoke -d main"
pass=0; fail=0
ok()  { pass=$((pass+1)); echo "PASS $1"; }
bad() { fail=$((fail+1)); echo "FAIL $1"; }

chk() { # name, expected, actual
  if [ "$2" = "$3" ]; then ok "$1"; else bad "$1 (expected [$2] got [$3])"; fi
}

chk "pg select"       "1"        "$(psql $P -tA -c 'select 1' 2>&1)"
chk "pg agg"          "25"       "$(psql $P -tA -c 'select count(*) from nation' 2>&1)"
chk "pg types"        "t|1.50|{1,2,3}" "$(psql $P -tA -c "select true, 1.50::decimal(5,2), array(1,2,3)" 2>&1)"
chk "pg multi-stmt"   "1
2" "$(psql $P -tA -c 'select 1; select 2' 2>&1)"
psql $P -c "drop table if exists main.smoke" >/dev/null 2>&1
chk "pg create"       "CREATE"   "$(psql $P -c 'create table main.smoke (a bigint, b string) using parquet' 2>&1 | head -1)"
chk "pg insert tag"   "INSERT 0 2" "$(psql $P -c "insert into main.smoke values (1,'x'),(2,'y')" 2>&1 | head -1)"
chk "pg update tag"   "UPDATE 1" "$(psql $P -c "update main.smoke set b='u' where a=1" 2>&1 | head -1)"
chk "pg delete tag"   "DELETE 1" "$(psql $P -c "delete from main.smoke where a=2" 2>&1 | head -1)"
chk "pg copy stdin"   "COPY 2"   "$(printf '5,p\n6,\\N\n' | psql $P -c 'copy main.smoke from stdin with csv' 2>&1 | head -1)"
chk "pg rows"         "3"        "$(psql $P -tA -c 'select count(*) from main.smoke' 2>&1)"
chk "pg describe q"   "n_name|VARCHAR|YES" "$(psql $P -tA -c 'describe select n_name from nation' 2>&1)"
chk "pg info_schema"  "smoke"    "$(psql $P -tA -c "select table_name from information_schema.tables where table_name='smoke'" 2>&1)"
chk "pg err recovers" "7"        "$(printf 'selectt 1;\nselect 7;\n' | psql $P -tA 2>/dev/null | tail -1)"

chk "ch select"       "1"        "$(curl -s "http://127.0.0.1:$CH/?query=SELECT%201")"
chk "ch version"      "23.3.1.2823" "$(curl -s "http://127.0.0.1:$CH/?query=SELECT%20version()")"
chk "ch jsoneachrow"  '{"n":0}'  "$(curl -s "http://127.0.0.1:$CH/" -d 'SELECT n_nationkey AS n FROM nation ORDER BY n LIMIT 1 FORMAT JSONEachRow')"
chk "ch limit n,m"    "NATION_2" "$(curl -s "http://127.0.0.1:$CH/" -d 'SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 2,1')"
curl -s "http://127.0.0.1:$CH/" -d 'CREATE TABLE main.smoke2 (x BIGINT) USING parquet' >/dev/null
chk "ch insert fmt"   "Ok."      "$(printf 'INSERT INTO smoke2 FORMAT TabSeparated\n10\n11\n' | curl -s "http://127.0.0.1:$CH/" --data-binary @-)"
chk "ch readback"     "10
11" "$(curl -s "http://127.0.0.1:$CH/?query=SELECT%20x%20FROM%20smoke2%20ORDER%20BY%20x")"
curl -s "http://127.0.0.1:$CH/" -d 'DROP TABLE main.smoke2' >/dev/null
psql $P -c "drop table main.smoke" >/dev/null 2>&1

python3 "$(dirname "$0")/pg_extended_test.py" "$PG" | sed 's/^/  ext /'

echo "smoke: $pass passed, $fail failed"
exit $((fail > 0))
