#!/bin/bash
cd /root/repo
echo "chain4 start: $(date)" > results/chain4.status
timeout 10800 python -u scripts/stream_er_sweep.py --scene both \
  --out results/stream_er.json > results/stream_er.log 2>&1
echo "stream_er exit: $? $(date)" >> results/chain4.status
echo "chain4 done: $(date)" >> results/chain4.status
