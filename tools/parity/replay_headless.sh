#!/usr/bin/env bash
# Headless replay inside the container: start the reference node with
# trajectory saving forced on, play the bag at a deterministic rate, wait
# for completion, and copy the TUM output to the mounted /out volume.
#
#   replay_headless.sh <config.yaml> <bag path> [rate]
set -euo pipefail
CONFIG=${1:?config yaml}
BAG=${2:?bag path}
RATE=${3:-1.0}

source /opt/ros/melodic/setup.bash
source /ws/devel/setup.bash

# Force TUM export regardless of the shipped config default
# (trajectory_saver.hpp writes result/traj/<stamp>.txt in TUM format).
TMPCFG=$(mktemp --suffix=.yaml)
sed -e 's/^save_traj_enable:.*/save_traj_enable: true/' "$CONFIG" > "$TMPCFG"

roscore &
ROSCORE_PID=$!
sleep 2

mkdir -p /ws/result/traj
(cd /ws && ./devel/lib/legkilo/legkilo_node --config_file="$TMPCFG") &
NODE_PID=$!
sleep 3

rosbag play --clock -r "$RATE" "$BAG"
sleep 2

# SIGINT triggers the node's clean shutdown (flushes the trajectory file
# and prints the Timer averages used for the 5-20 ms/frame claim).
kill -INT $NODE_PID; wait $NODE_PID || true
kill $ROSCORE_PID || true

cp -v /ws/result/traj/*.txt /out/
