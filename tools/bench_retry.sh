#!/bin/bash
for i in $(seq 1 10); do
  timeout 590 python bench.py > /tmp/bench_r5.out 2> /tmp/bench_r5.err
  if ! grep -q "device_unresponsive" bench_detail.json 2>/dev/null; then
    cp bench_detail.json /tmp/bench_detail_good.json
    echo "attempt $i: SUCCESS"; cat /tmp/bench_r5.out; exit 0
  fi
  echo "attempt $i: device unresponsive; sleeping"
  sleep 90
done
echo "all attempts failed"
