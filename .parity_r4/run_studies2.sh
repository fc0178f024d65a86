#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/repo/tools
unset PALLAS_AXON_POOL_IPS
R=/root/repo/.parity_r4
run() {
  name=$1; shift
  echo "=== $name start $(date +%T)" >> $R/progress.log
  timeout 7200 python tools/refemu/run_parity.py "$@" --json_out $R/$name.json > $R/$name.out 2> $R/$name.err
  echo "=== $name rc=$? end $(date +%T)" >> $R/progress.log
}
run extreme_imu_20_it3 --mode imu --traj extreme --duration 20
run corridor_kin_60_ablate --mode kin --world corridor --traj corridor --duration 60 --ablate
echo "PHASE2 DONE $(date +%T)" >> $R/progress.log
