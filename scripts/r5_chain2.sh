#!/bin/bash
# Round-5 TPU job chain, part 2: scan-scale bound telemetry, field-stage
# convergence runs, reference-spp eval with the device-time probe.
# Waits for chain1 (one TPU client at a time).
cd /root/repo
while ! grep -q "chain1 done" results/chain1.status 2>/dev/null; do
  sleep 60
done
echo "chain2 start: $(date)" > results/chain2.status
timeout 5400 python -u scripts/huge_bound.py --scene huge \
  --out results/bound_huge.json > results/bound_huge.log 2>&1
echo "bound_huge exit: $? $(date)" >> results/chain2.status
timeout 5400 python -u scripts/huge_bound.py --scene big \
  --out results/bound_big.json > results/bound_big.log 2>&1
echo "bound_big exit: $? $(date)" >> results/chain2.status
# IRRF converged: validate every ~250 epochs (64 steps/epoch x 16000)
timeout 7200 python -u -m texir_code_tpu.cli train \
  --conf configs/irrf_synthetic.conf --expname fieldq --trainstage IRRF \
  --max_epochs 1000 --set train.plot_freq=16000 \
  > results/irrf_fieldq.log 2>&1
echo "irrf exit: $? $(date)" >> results/chain2.status
timeout 5400 python -u -m texir_code_tpu.cli train \
  --conf configs/irrf_synthetic.conf --expname fieldq --trainstage PIL \
  --max_epochs 0400 > results/pil_fieldq.log 2>&1
echo "pil exit: $? $(date)" >> results/chain2.status
timeout 5400 python -u -m texir_code_tpu.cli train \
  --conf configs/irrf_synthetic.conf --expname fieldq --trainstage IRF \
  --max_epochs 300 > results/irf_fieldq.log 2>&1
echo "irf exit: $? $(date)" >> results/chain2.status
timeout 5400 python -u scripts/eval_reference_spp.py \
  > results/refspp_r5.log 2>&1
echo "refspp exit: $? $(date)" >> results/chain2.status
echo "chain2 done: $(date)" >> results/chain2.status
