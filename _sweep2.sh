#!/bin/bash
cd /root/repo
for cfg in "512 128 1" "1024 128 1" "2048 128 1" "1024 256 1"; do
  echo "=== $cfg ===" >> /tmp/sweep2.log
  timeout 1200 python _sweep2.py $cfg 2>&1 | grep -vi warning | tail -2 >> /tmp/sweep2.log
done
echo DONE >> /tmp/sweep2.log
