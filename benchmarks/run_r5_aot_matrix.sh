#!/bin/bash
# Sequential AOT probe matrix (after the first pallas/22/scan run).
cd /root/repo
export PYTHONPATH="$PYTHONPATH:/root/repo"
for cfg in "pallas 22 4 unroll" "xla 22 4 scan" "pallas 12 4 scan" "pallas 6 4 scan" "pallas 22 2 scan"; do
  set -- $cfg
  log="benchmarks/tpu_return_logs/r5_aot_$1_$2_$3_$4.log"
  echo "=== running $cfg -> $log"
  timeout 900 python benchmarks/probe_r5_aot.py $1 $2 $3 $4 > "$log" 2>&1
  echo "rc=$? for $cfg"
  grep -E "lower:|compile:|execute|RESULT" "$log" | head -6
done
