#!/bin/bash
# Round-5 TPU job chain, part 1 (one TPU client at a time, jobs sequential;
# `;`-chained so one failure doesn't strand the rest).
cd /root/repo
echo "chain1 start: $(date)" > results/chain1.status
timeout 2400 python -u scripts/heads_reval.py > results/heads_reval.log 2>&1
echo "reval exit: $? $(date)" >> results/chain1.status
timeout 10800 python -u scripts/roughness_ablation.py > results/ablation_run.log 2>&1
echo "ablation exit: $? $(date)" >> results/chain1.status
timeout 10800 python -u scripts/building_quality.py > results/building_run.log 2>&1
echo "building exit: $? $(date)" >> results/chain1.status
echo "chain1 done: $(date)" >> results/chain1.status
