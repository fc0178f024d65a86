#!/bin/bash
# Round-4 committed parity studies (VERDICT tasks 1+2).
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
run corridor_kin_60 --mode kin --world corridor --traj corridor --duration 60
run floor_kin_60    --mode kin --world floor    --traj rich     --duration 60
run aggr_imu_30     --mode imu --traj aggressive --duration 30
run aggr_kin_30     --mode kin --traj aggressive --duration 30
run extreme_imu_20  --mode imu --traj extreme    --duration 20
echo "ALL DONE $(date +%T)" >> $R/progress.log
