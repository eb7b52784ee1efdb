#!/bin/bash
# Round-5 chain 3: the bound telemetry (fixed) after chain2 drains.
cd /root/repo
while ! grep -q "chain2 done" results/chain2.status 2>/dev/null; do
  sleep 60
done
echo "chain3 start: $(date)" > results/chain3.status
timeout 5400 python -u scripts/huge_bound.py --scene huge \
  --out results/bound_huge.json > results/bound_huge.log 2>&1
echo "bound_huge exit: $? $(date)" >> results/chain3.status
timeout 5400 python -u scripts/huge_bound.py --scene big \
  --out results/bound_big.json > results/bound_big.log 2>&1
echo "bound_big exit: $? $(date)" >> results/chain3.status
echo "chain3 done: $(date)" >> results/chain3.status
